package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, AttributeSet, EqualTo}
import org.apache.spark.sql.catalyst.plans.LeftOuter
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

  def colsFor(path: String): Set[String] =
    byPath.getOrDefault(normalize(path), Set.empty)

  /** Output attributes of `plan` that are unique-per-row, traced to scan
    * declarations through the operators that preserve per-column
    * uniqueness: projection/aliasing, filtering (removing rows cannot
    * create duplicates), repartitioning, and subquery aliasing.
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
    case rel: LogicalRelation => rel.relation match {
      case fs: HadoopFsRelation =>
        val declared = fs.location.rootPaths
          .flatMap(p => colsFor(p.toString)).toSet
        AttributeSet(rel.output.filter(a => declared.contains(a.name)))
      case _ => AttributeSet.empty
    }
    case _ => AttributeSet.empty
  }
}

/** Remove LEFT OUTER joins that provably contribute nothing: the join
  * key on the preserved side equates to a DECLARED-unique attribute of
  * the other side, and the projection above the join reads only
  * preserved-side columns. Soundness: uniqueness bounds matches at one,
  * LEFT OUTER forbids dropping probe rows, and the unreferenced join
  * output makes match-vs-null-extension unobservable — so the join is
  * row- and value-identity on everything the query can see, under ANY
  * filtering of the dimension side. See [[UniqueKeys]].
  */
object EliminateUniqueKeyLeftJoin extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.eliminateUniqueKeyJoins", "true")
        .toBoolean) return plan
    plan.transformUp {
      case Project(projList,
          Join(left, right, LeftOuter, Some(EqualTo(a, b)), _))
          if projList.forall(_.references.subsetOf(left.outputSet)) &&
            isUniqueRightKey(left, right, a, b) =>
        Project(projList, left)
    }
  }

  private def isUniqueRightKey(left: LogicalPlan, right: LogicalPlan,
                               a: Any, b: Any): Boolean = {
    val sides = Seq(a, b).collect { case ar: AttributeReference => ar }
    if (sides.length != 2) return false
    sides.exists(k => left.outputSet.contains(k)) && {
      val unique = UniqueKeys.uniqueOutputAttrs(right)
      sides.exists(k => right.outputSet.contains(k) && unique.contains(k))
    }
  }
}
