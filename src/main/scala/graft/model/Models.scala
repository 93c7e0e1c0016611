package graft.model

import java.sql.Timestamp

/** Case-class models for the driver tables (schemas verified in
  * FIXTURES.md) — the typed `Dataset[T]` surface. Use these when
  * compile-time field checking helps (complex per-row logic, typed
  * joins/groups); stay with `DataFrame` for purely relational plans,
  * which keep Catalyst fully in charge.
  */
case class Lineitem(
    l_orderkey: Long, l_partkey: Long, l_suppkey: Long, l_linenumber: Int,
    l_quantity: Double, l_extendedprice: Double, l_discount: Double,
    l_tax: Double, l_returnflag: String, l_linestatus: String,
    l_shipdate: Timestamp)

case class Order(
    o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
    o_totalprice: Double, o_orderdate: Timestamp, o_orderpriority: String)

case class Customer(
    c_custkey: Long, c_name: String, c_nationkey: Int, c_mktsegment: String,
    c_acctbal: Double)

case class Document(
    doc_id: Long, text: String, lang: String, source: String, n_chars: Long)

case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)

case class Event(
    event_id: Long, ts: Timestamp, user_id: Long, event_type: String,
    value: Double, props: String)
