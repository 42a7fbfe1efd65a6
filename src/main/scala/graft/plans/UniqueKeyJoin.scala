package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, AttributeSet, EqualTo, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Informational unique-key constraints for scan relations, and the
  * redundant-join elimination they license.
  *
  * A warehouse declares its keys (`PRIMARY KEY` / `UNIQUE` in the
  * reference's DDL, `create_datawarehouse.sql:9-50`); an engine that
  * knows them can delete provably-redundant work. The classic case — the
  * reference's own gold build shape (`python_scripts.py:566-573`,
  * `SELECT fact.* FROM fact LEFT JOIN dim ...`) — is a LEFT join against
  * a unique key where no dimension column is ever read: with the key
  * unique, every probe row produces EXACTLY one output row (one match,
  * or one null-extension that nothing observes), so the join is the
  * identity on the probe side and the whole dimension scan + exchange +
  * hash build is dead weight. At 100 TB that is the difference between a
  * fact-wide shuffle and no shuffle at all, and it is precisely the
  * rewrite SQL Server / Oracle / Postgres perform from declared PKs.
  *
  * Spark has no constraint catalog, so [[UniqueKeys]] carries one:
  * declarations are keyed by the scan's file-system path (the identity
  * [[graft.Tables]] hands out), and [[EliminateUniqueKeyLeftJoin]]
  * consumes them inside the operator-optimization fixed point — nested
  * star joins unwrap outside-in, one probe per iteration. Disable with
  * `spark.graft.eliminateUniqueKeyJoins=false` (the parity specs do, to
  * force the physical join).
  */
object UniqueKeys {
  /** normalized path (scheme-stripped URI path) -> unique column names */
  private val byPath =
    new java.util.concurrent.ConcurrentHashMap[String, Set[String]]()

  private def normalize(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  /** Declare `cols` as each individually unique in the table at `path`.
    * Informational only: the engine TRUSTS the declaration, exactly like
    * an RDBMS trusts (and enforces) a PRIMARY KEY. Re-declaration
    * overwrites.
    */
  def declare(path: String, cols: Set[String]): Unit =
    byPath.put(normalize(path), cols)

  /** Drop declarations under `pathPrefix` (or all, with no prefix).
    * [[graft.Tables.invalidate]] calls this so overwriting a declared
    * path with new data cannot leave a stale constraint feeding the
    * optimizer — the REFRESH TABLE analogue for the constraint catalog.
    */
  def undeclare(pathPrefix: Option[String] = None): Unit = pathPrefix match {
    case Some(p) =>
      // path-boundary match: undeclaring /data/foo must not also drop
      // /data/foobar — only the exact path or true descendants
      val n = normalize(p).stripSuffix("/")
      byPath.keySet.removeIf(k => k == n || k.startsWith(n + "/"))
    case None => byPath.clear()
  }

  def colsFor(path: String): Set[String] =
    byPath.getOrDefault(normalize(path), Set.empty)

  /** Accepted kill-switch spellings (see [[EliminateUniqueKeyLeftJoin]]). */
  private[plans] val FalsySpellings = Set("false", "0", "off", "no")
  private[plans] val TruthySpellings = Set("true", "1", "on", "yes")
  /** Conf values already warned about — bounds the log to one line per
    * distinct misspelling per JVM, not one per optimized query.
    */
  private[plans] val warnedConfValues =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Output attributes of `plan` that are unique-per-row, traced to scan
    * declarations through the operators that preserve per-column
    * uniqueness: projection/aliasing, row-subsetting (filter, limit,
    * semi/anti join — removing rows cannot create duplicates), ordering,
    * repartitioning, and subquery aliasing. Grouping CREATES uniqueness:
    * a single-expression `Aggregate` (the optimizer's form of GROUP BY
    * one key, DISTINCT over one column, and dropDuplicates on one key)
    * emits each grouping value exactly once, so its grouping output is
    * unique by construction regardless of the child.
    */
  def uniqueOutputAttrs(plan: LogicalPlan): AttributeSet = plan match {
    case Project(projList, child) =>
      val below = uniqueOutputAttrs(child)
      AttributeSet(projList.collect {
        case a: AttributeReference if below.contains(a) => a
        case al @ Alias(a: AttributeReference, _) if below.contains(a) =>
          al.toAttribute
      })
    case Filter(_, child) => uniqueOutputAttrs(child)
    case SubqueryAlias(_, child) => uniqueOutputAttrs(child)
    case r: RepartitionOperation => uniqueOutputAttrs(r.child)
    case s: Sort => uniqueOutputAttrs(s.child)
    case l: GlobalLimit => uniqueOutputAttrs(l.child)
    case l: LocalLimit => uniqueOutputAttrs(l.child)
    case j @ Join(left, _, LeftSemi | LeftAnti, _, _) =>
      // output rows are a subset of left's rows with left's schema
      uniqueOutputAttrs(left)
    case Aggregate(Seq(g), aggExprs, _, _) =>
      // one grouping expression -> its output column holds each distinct
      // value exactly once (unique whatever the child was)
      AttributeSet(aggExprs.collect {
        case a: AttributeReference if a.semanticEquals(g) => a
        case al @ Alias(c, _) if c.semanticEquals(g) => al.toAttribute
      })
    case d @ Deduplicate(Seq(key: AttributeReference), _) =>
      AttributeSet(d.output.filter(_.semanticEquals(key)))
    case rel: LogicalRelation => rel.relation match {
      // honor declarations only for SINGLE-path scans: a relation built
      // over several paths (spark.read.parquet(a, b)) can collide keys
      // across paths, so a per-path PK proves nothing about the union
      case fs: HadoopFsRelation if fs.location.rootPaths.size == 1 =>
        val declared = fs.location.rootPaths
          .flatMap(p => colsFor(p.toString)).toSet
        AttributeSet(rel.output.filter(a => declared.contains(a.name)))
      case _ => AttributeSet.empty
    }
    case _ => AttributeSet.empty
  }
}

/** Remove outer joins that provably contribute nothing: some
  * equi-conjunct of the join condition equates a preserved-side value
  * to a DECLARED-unique attribute of the other side, and the consuming
  * operator directly above the join reads only preserved-side columns.
  * Soundness: uniqueness bounds matches at one PER CONJUNCT — any
  * further conjuncts can only reject that single candidate, never add
  * matches — the outer join forbids dropping preserved rows, and the
  * unreferenced join output makes match-vs-null-extension unobservable.
  * So the join is row- and value-identity on everything the query can
  * see, under ANY filtering of the other side — which also preserves
  * aggregates bit-exactly, `count(*)` included, so the consumer may be
  * a [[Project]] OR an [[Aggregate]] sitting directly on the join
  * (Catalyst's column pruning inserts no Project between an Aggregate
  * and its join child, so matching Project alone misses the
  * `GROUP BY fact.x` star shapes). LEFT OUTER preserves the left side;
  * RIGHT OUTER is the mirror. See [[UniqueKeys]].
  */
object EliminateUniqueKeyLeftJoin extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    // lenient parse: a malformed conf value must not detonate inside the
    // optimizer (which would fail every query in the session). All common
    // falsy spellings disable the rule; anything unrecognized keeps the
    // default-on behavior but WARNS (once per distinct value) — a user who
    // typo'd their kill-switch must not silently get rewritten plans
    val raw = conf.getConfString("spark.graft.eliminateUniqueKeyJoins", "true")
    val v = raw.trim.toLowerCase(java.util.Locale.ROOT)
    val off = UniqueKeys.FalsySpellings.contains(v)
    if (!off && !UniqueKeys.TruthySpellings.contains(v) &&
        UniqueKeys.warnedConfValues.add(raw)) {
      logWarning(s"spark.graft.eliminateUniqueKeyJoins=$raw is not a " +
        "recognized boolean (true/false/1/0/on/off/yes/no); join " +
        "elimination stays ENABLED")
    }
    if (off) return plan
    plan.transformUp {
      case p @ Project(projList, j: Join) =>
        preservedSide(j, AttributeSet(projList.flatMap(_.references)))
          .map(side => p.copy(child = side)).getOrElse(p)
      case a @ Aggregate(gExprs, aExprs, j: Join, _) =>
        preservedSide(j, AttributeSet((gExprs ++ aExprs).flatMap(_.references)))
          .map(side => a.copy(child = side)).getOrElse(a)
    }
  }

  /** The join's preserved side, when `refs` read only that side and the
    * other side's key is declared unique under the join condition.
    */
  private def preservedSide(j: Join, refs: AttributeSet): Option[LogicalPlan] =
    j match {
      case Join(left, right, LeftOuter, Some(cond), _)
          if refs.subsetOf(left.outputSet) && cond.deterministic &&
            hasUniqueConjunct(probe = left, dim = right, cond) =>
        Some(left)
      case Join(left, right, RightOuter, Some(cond), _)
          if refs.subsetOf(right.outputSet) && cond.deterministic &&
            hasUniqueConjunct(probe = right, dim = left, cond) =>
        Some(right)
      case _ => None
    }

  private def hasUniqueConjunct(probe: LogicalPlan, dim: LogicalPlan,
                                cond: Expression): Boolean = {
    // a streaming dim's grouped "uniqueness" holds per micro-batch, not
    // across the incremental result evolution — don't reason about it
    if (dim.isStreaming) return false
    val unique = UniqueKeys.uniqueOutputAttrs(dim)
    unique.nonEmpty && splitConjunctivePredicates(cond).exists {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        (probe.outputSet.contains(a) && dim.outputSet.contains(b) &&
          unique.contains(b)) ||
        (probe.outputSet.contains(b) && dim.outputSet.contains(a) &&
          unique.contains(a))
      case _ => false
    }
  }
}
