package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The Mozilla Public Suffix List (publicsuffix.org — public data, shipped
  * verbatim as `src/main/resources/public_suffix_list.dat`), compiled once
  * per JVM into per-label-count hash sets and evaluated by a native
  * codegen'd expression — no UDF, no join, no broadcast, scan-speed.
  *
  * Rule grammar (https://publicsuffix.org/list/ — the algorithm section):
  *   - exact rules (`co.nz`) — a host's public suffix is the longest rule
  *     whose labels are a suffix of the host's labels;
  *   - wildcard rules (`*.ck`) — `*` matches exactly one label;
  *   - exception rules (`!www.ck`) — a matching exception PREVAILS over
  *     every other match, and its public suffix is the rule minus its
  *     leftmost label;
  *   - no rule matches → the default rule `*` (the bare TLD is public).
  * The registrable domain (eTLD+1) is the public suffix plus one label.
  *
  * Why a native expression and not an `isin` chain: ~9.5k rules as InSet
  * literals make a megabyte-scale expression tree (the full host
  * sub-expression re-expands under every probe before codegen CSE), while
  * this node prints as one `registrable_domain(host)` call and its
  * generated code is a single static-method invocation against lookup
  * sets that live once per executor — nothing in the plan or the task
  * closure is proportional to the rule count.
  *
  * Unicode: the list carries IDN rules in Unicode form (`中国`); each is
  * also indexed under its punycode (`xn--fiqs8s`) via `java.net.IDN`, so
  * both host spellings group correctly.
  */
object PublicSuffix {

  /** exact(k) = k-label exact rules; wildParents(k) = k-label PARENTS of
    * (k+1)-label wildcard rules (`*.ck` → parent `ck` under k=1);
    * exc(k) = k-label exception rules (match → public-suffix length k-1).
    */
  final case class Rules(exact: Map[Int, Set[String]],
                         wildParents: Map[Int, Set[String]],
                         exc: Map[Int, Set[String]], maxMatchLabels: Int) {
    val excByLenDesc: Seq[(Int, Set[String])] = exc.toSeq.sortBy(-_._1)
  }

  /** Parsed once per JVM; ~9.5k rules, a few hundred KB of sets. */
  lazy val rules: Rules = {
    val in = getClass.getResourceAsStream("/public_suffix_list.dat")
    require(in != null, "public_suffix_list.dat missing from resources")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    val lines = try src.getLines()
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("//")).toVector
    finally src.close()
    // index each rule under its Unicode form AND its punycode form
    def forms(rule: String): Seq[String] = {
      val lower = rule.toLowerCase
      if (lower.forall(_ < 128)) Seq(lower)
      else {
        val puny = try java.net.IDN.toASCII(lower) catch { case _: Exception => lower }
        Seq(lower, puny.toLowerCase).distinct
      }
    }
    val exact = collection.mutable.Map.empty[Int, Set[String]].withDefaultValue(Set.empty)
    val wildP = collection.mutable.Map.empty[Int, Set[String]].withDefaultValue(Set.empty)
    val exc = collection.mutable.Map.empty[Int, Set[String]].withDefaultValue(Set.empty)
    var maxK = 1
    lines.foreach { raw =>
      // a rule is the first whitespace-delimited token (spec: anything
      // after whitespace on a rule line is ignorable)
      val rule = raw.split("\\s+")(0)
      if (rule.startsWith("!")) {
        forms(rule.substring(1)).foreach { f =>
          val k = f.count(_ == '.') + 1
          exc(k) = exc(k) + f
          maxK = math.max(maxK, k)
        }
      } else if (rule.startsWith("*.")) {
        forms(rule.substring(2)).foreach { f =>
          val k = f.count(_ == '.') + 1 // parent labels; the rule matches k+1
          wildP(k) = wildP(k) + f
          maxK = math.max(maxK, k + 1)
        }
      } else {
        forms(rule).foreach { f =>
          val k = f.count(_ == '.') + 1
          exact(k) = exact(k) + f
          maxK = math.max(maxK, k)
        }
      }
    }
    Rules(exact.toMap, wildP.toMap, exc.toMap, maxK)
  }

  /** eTLD+1 of an already-lowercased host, JVM-side: longest match wins,
    * exceptions prevail, unmatched TLDs take the default rule `*`. A host
    * that IS a public suffix (or a single label) returns whole — the
    * grouping key stays total, matching the operator contract.
    */
  def registrableDomainOf(host: String): String = {
    val r = rules
    val K = r.maxMatchLabels
    // starts(k) = index of the last-k-label suffix; m = how many levels
    // exist (min(label count, K+1) — K+1 because eTLD+1 needs one more)
    val starts = new Array[Int](K + 2)
    var f = 0
    var j = host.length - 1
    while (j >= 0 && f < K + 1) {
      if (host.charAt(j) == '.') { f += 1; starts(f) = j + 1 }
      j -= 1
    }
    val m = if (f < K + 1) { starts(f + 1) = 0; f + 1 } else f
    def suf(k: Int): String = if (starts(k) == 0) host else host.substring(starts(k))
    // 1. a matching exception rule prevails over everything
    for ((k, set) <- r.excByLenDesc)
      if (k <= m && set.contains(suf(k)))
        return if (m > k - 1) suf(k) else host
    // 2. longest match over exact + wildcard rules
    var k = math.min(K, m)
    while (k >= 2) {
      val hit = r.exact.get(k).exists(_.contains(suf(k))) ||
        (m >= k && r.wildParents.get(k - 1).exists(_.contains(suf(k - 1))))
      if (hit) return if (m > k) suf(k + 1) else host
      k -= 1
    }
    // 3. k=1: an exact 1-label rule and the default rule `*` agree
    if (m > 1) suf(2) else host
  }

  /** UTF8String bridge for codegen (case-folds, so the expression is
    * correct standalone).
    */
  def domainData(u: UTF8String): UTF8String = {
    val s = u.toString
    val lower = if (s.forall(c => c < 'A' || c > 'Z')) s else s.toLowerCase
    val d = registrableDomainOf(lower)
    if (d eq lower) UTF8String.fromString(lower) else UTF8String.fromString(d)
  }

  /** Native expression: prints as `registrable_domain(host)`, generates a
    * single static call — the plan and closure stay rule-count-free.
    */
  case class PublicSuffixDomain(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "registrable_domain"
    override def nullSafeEval(input: Any): Any =
      domainData(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.operators.PublicSuffix.domainData($c)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** eTLD+1 as a column over a hostname column. */
  def registrableDomain(h: Column): Column =
    ColumnBridge.column(PublicSuffixDomain(ColumnBridge.expression(h)))
}
