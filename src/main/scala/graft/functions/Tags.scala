package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tag lookup + the xargs filter algebra (SURVEY.md §2.4).
  *
  * Reference semantics (all in /root/reference/src/shard.re):
  *  - lookup is FIRST match on duplicate names (`shard.re:116-120`,
  *    `List.assoc_opt`);
  *  - untagged points never pass a tag filter (`shard.re:122-127`,
  *    None → false);
  *  - within one tag name, multiple values OR (`shard.re:129-133`);
  *  - across different names, groups AND (fold at `shard.re:181-188`);
  *  - `contains` is substring: point's tag value contains the query value
  *    (`src/timeseries.re:490-500`, arg order at `shard.re:115-119`).
  *
  * Everything compiles to built-in higher-order functions — no UDFs, so the
  * predicates stay inside whole-stage codegen and push into the scan where
  * possible.
  */
object Tags {

  /** First-match tag lookup: value of the first entry named `name`, else
    * null — a native codegen'd expression (TagLookup) so the predicate
    * stays fused in whole-stage codegen.
    */
  def tagLookup(tag: Column, name: String): Column =
    TagExpressions.tag_lookup(tag, lit(name))

  /** The composable formulation (interpreted HOFs; reference semantics
    * identical — kept for equivalence tests). `get` (0-based) rather than
    * `element_at`: under ANSI mode (Spark 4 default) element_at throws on
    * out-of-bounds, while a missing tag must read as null → filter-false
    * (reference: None → false, shard.re:123-124).
    */
  def tagLookupHof(tag: Column, name: String): Column =
    get(filter(tag, t => t.getField("name") === lit(name)), lit(0)).getField("value")

  sealed trait Match
  case object Eq extends Match
  case object Contains extends Match

  /** One filter group: a tag name, candidate values (OR), and match kind. */
  final case class Group(name: String, values: Seq[String], matchKind: Match)

  /** Set-semantics predicate for a filter pipeline: AND across groups,
    * OR within a group. (We intentionally do NOT replicate the reference's
    * output-duplication quirk under multi-value `contains` —
    * `shard.re:129-133` rev_appends per-value match lists — documented
    * divergence, SURVEY §7.5 #5.)
    */
  def predicate(tag: Column, groups: Seq[Group]): Column =
    groups.map { g =>
      val looked = tagLookup(tag, g.name)
      g.values.map { v =>
        g.matchKind match {
          case Eq       => looked === lit(v)
          case Contains => looked.contains(v)
        }
      }.reduce(_ || _)
    }.reduce(_ && _)

  /** Parse the reference's comma-separated names/values route form
    * (`shard.re:176-180`): names and values are comma-split and zipped;
    * pairs sharing a name become one OR group. Count mismatch → error
    * (reference F4, `shard.re:180` `failwith("invalid filter format")`).
    */
  def parseGroups(names: String, values: String, matchKind: Match): Seq[Group] = {
    val ns = names.split(',').toSeq
    val vs = values.split(',').toSeq
    require(ns.length == vs.length, "invalid filter format")
    ns.zip(vs).groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (n, pairs) => Group(n, pairs.map(_._2), matchKind) }
  }
}
