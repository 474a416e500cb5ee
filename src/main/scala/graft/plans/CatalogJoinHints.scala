package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, HintInfo, Join, JoinHint, LogicalPlan, Project, SHUFFLE_MERGE}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: a cost-based join strategist driven by the persisted
  * sketch statistics catalog (q341's 5-row parquet of row counts +
  * Count-Min sketches per (relation, join key)).
  *
  * q346 proved the catalog can drive a plan — but by HAND: the query
  * itself consulted the stats and stamped `broadcast()`/`hint("merge")`.
  * This rule moves that consult into the optimizer, so ANY unhinted inner
  * equi-join over cataloged relations gets the CBO treatment
  * automatically (the r14 verdict's "promote from hints to a Rule"):
  *
  *   - a join side that IS a cataloged relation (modulo column-pruning
  *     projections) is estimated by its cataloged row count;
  *   - a join side that is itself an inner equi-join of two cataloged
  *     relations — an INTERMEDIATE whose size exists in no row count — is
  *     estimated by the Count-Min inner product of its own join keys'
  *     sketches (the decision a row-count-only planner cannot make);
  *   - build side = the smaller estimate (ties prefer the right side,
  *     q346's `<=` order); at or under `graft.catalog.broadcastRowBound`
  *     rows it gets a BROADCAST strategy hint, above it SHUFFLE_MERGE —
  *     ENFORCED either way, so Spark's size-threshold auto-broadcast
  *     cannot silently second-guess the catalog's shuffle verdict.
  *
  * Opt-in is per-ATTRIBUTE, not per-session: the rule fires only on join
  * keys carrying the [[CatalogJoinHints.KeyMeta]] /
  * [[CatalogJoinHints.DirMeta]] column metadata (the catalog key, e.g.
  * `"orders.o_custkey"`, and the staged catalog's path). Metadata rides
  * the `AttributeReference` through analysis and optimization, so marked
  * relations keep their mark across projections and joins, while every
  * unmarked query in the session plans exactly as before — installing the
  * rule has ZERO blast radius beyond columns a query explicitly marked
  * (the conf-leak lesson from this rule's q346 precursor: a session-wide
  * gate would re-plan later queries' joins over the same tables).
  *
  * The catalog is read ONCE per staged path (a 5-row, schema-bounded
  * collect — the microsecond stats lookup every CBO does) and memoized
  * JVM-wide; the path is content-addressed by the corpus sourceKey
  * fingerprint upstream, so staleness invalidates the path, never the
  * cache (the staging-memo doctrine). Deeper trees than one join level
  * estimate as None and stamp nothing — the engine's default planning
  * applies (documented fallback, not a silent guess).
  *
  * Install via [[GraftPlans.install]] or
  * `spark.sql.extensions=graft.functions.GraftExtensions`. Registered
  * adopter: q348 (unhinted 3-way events⋈orders⋈customer; PlanSpec pins
  * that flipping the bound conf flips the planned physical strategy).
  */
case class CatalogJoinHints() extends Rule[LogicalPlan] with PredicateHelper {
  import CatalogJoinHints._

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(l, r, Inner, Some(cond), hint)
        if hint == JoinHint.NONE && !j.isStreaming && markedKeys(j, cond).isDefined =>
      val bound = conf
        .getConfString("graft.catalog.broadcastRowBound", DefaultBound.toString)
        .toLong
      (estRows(l), estRows(r)) match {
        case (Some(nl), Some(nr)) =>
          val buildRight = nr <= nl
          val n = math.min(nl, nr)
          val hi = HintInfo(strategy =
            Some(if (n <= bound) BROADCAST else SHUFFLE_MERGE))
          j.copy(hint =
            if (buildRight) JoinHint(None, Some(hi))
            else JoinHint(Some(hi), None))
        case _ => j
      }
  }

  /** The join's cross-side equi pair where BOTH attributes carry the
    * catalog mark — the rule's opt-in trigger. */
  private def markedKeys(j: Join, cond: Expression)
      : Option[(String, String, String)] =
    splitConjunctivePredicates(cond).collectFirst {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if keyOf(a).isDefined && keyOf(b).isDefined &&
            dirOf(a).isDefined &&
            (a.references.subsetOf(j.left.outputSet) !=
              b.references.subsetOf(j.left.outputSet)) =>
        (keyOf(a).get, keyOf(b).get, dirOf(a).get)
    }

  private def keyOf(a: AttributeReference): Option[String] =
    if (a.metadata.contains(KeyMeta)) Some(a.metadata.getString(KeyMeta))
    else None
  private def dirOf(a: AttributeReference): Option[String] =
    if (a.metadata.contains(DirMeta)) Some(a.metadata.getString(DirMeta))
    else None

  /** Row-count estimate of one join side, from the catalog only: a marked
    * base relation → its cataloged count; a one-level inner equi-join of
    * two marked relations → the CM inner product of its own keys' sketches.
    * Anything else → None (no hint; default planning).
    *
    * The marked attribute lives in the side's OWN output (the Alias that
    * carries the metadata projects it there and every plan above
    * propagates the AttributeReference) — so the base lookup reads
    * `p.output`, never the leaf relation's unmarked schema; projections
    * are stripped only to detect whether the side is itself a join. */
  private def estRows(p: LogicalPlan): Option[Long] = {
    @scala.annotation.tailrec
    def strip(q: LogicalPlan): LogicalPlan = q match {
      case Project(_, c) => strip(c)
      case _ => q
    }
    strip(p) match {
      case j @ Join(_, _, Inner, Some(cond), _) =>
        markedKeys(j, cond).map { case (ka, kb, dir) =>
          innerProductEst(stats(SparkSession.active, dir), ka, kb)
        }
      case _ =>
        p.output.collectFirst {
          case a: AttributeReference if keyOf(a).isDefined && dirOf(a).isDefined =>
            stats(SparkSession.active, dirOf(a).get)(keyOf(a).get)._1
        }
    }
  }
}

object CatalogJoinHints {
  /** Attribute-metadata keys: the catalog entry this column joins under
    * (e.g. `"orders.o_custkey"`) and the staged catalog's path. */
  val KeyMeta = "graft.catalog.key"
  val DirMeta = "graft.catalog.dir"

  /** Catalog sketch geometry (shared with q341/q346's staging and oracle). */
  val CmDepth = 4
  val CmWidth = 1024

  /** q346's broadcast gate default, shared by the rule. */
  val DefaultBound = 1000000L

  private val cache =
    TrieMap.empty[String, Map[String, (Long, Array[Long])]]

  /** The catalog snapshot: rel.key → (row count, 4×1024 CM sketch).
    * One 5-row collect per staged path per JVM (size-bounded by schema). */
  def stats(spark: SparkSession, dir: String)
      : Map[String, (Long, Array[Long])] =
    cache.getOrElseUpdate(dir, {
      spark.read.parquet(dir).collect().map { r =>
        r.getString(r.fieldIndex("rel")) ->
          (r.getLong(r.fieldIndex("n")),
            r.getSeq[Long](r.fieldIndex("sk")).toArray)
      }.toMap
    })

  /** min over depths of Σ_cell a·b — the classic CM join-size estimate,
    * never under the true size. BigInt lane mirrors the oracle's HUGEINT
    * (the q346 overflow doctrine); the Long saturates at MaxValue, which
    * preserves every ≤-bound verdict. */
  def innerProductEst(st: Map[String, (Long, Array[Long])],
                      ka: String, kb: String): Long = {
    val a = st(ka)._2
    val b = st(kb)._2
    (0 until CmDepth).map { di =>
      var acc = BigInt(0)
      var i = 0
      while (i < CmWidth) {
        acc += BigInt(a(di * CmWidth + i)) * b(di * CmWidth + i); i += 1
      }
      acc
    }.min.min(BigInt(Long.MaxValue)).toLong
  }
}
