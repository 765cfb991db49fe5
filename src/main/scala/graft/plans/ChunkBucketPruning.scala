package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, Cast, EqualTo, Expression, Literal, Pmod, PredicateHelper, XxHash64}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule (SURVEY §4.2 optional custom `Rule[LogicalPlan]`):
  * whenever a plan filters a chunk-shaped relation (one that carries the
  * `doc_bucket` partition column) on `document_id = <literal>`, inject the
  * matching `doc_bucket = pmod(xxhash64(id), nBuckets)` predicate.
  *
  * The injected expression is foldable, so ConstantFolding turns it into
  * a literal partition filter and the scan prunes to 1 of N partitions —
  * users (and ad-hoc SQL) get the SURVEY §7.4.7 storage layout's benefit
  * without knowing the bucketing convention. Idempotent: skips filters
  * that already mention doc_bucket.
  *
  * Bucket count comes from `spark.graft.chunkBuckets` (default 16) and
  * must match the ingest configuration.
  */
class ChunkBucketPruning(spark: SparkSession)
  extends Rule[LogicalPlan] with PredicateHelper {

  // bucket count per table root, resolved from the `_graft_buckets`
  // marker the ingest writes next to the data (conf is the fallback).
  // Present markers are cached with a TTL: the convention normally never
  // changes, but a full-table re-bucket rewrites the marker, and a live
  // session pruning with the stale count would silently filter out every
  // row — the TTL bounds that exposure to seconds at the cost of one tiny
  // sidecar read per table per TTL window.
  // same knob as DocumentStore's marker cache, so one conf governs every
  // stale-marker exposure window in the session
  private def markerTtlNanos: Long =
    spark.conf.get("spark.graft.bucketMarkerTtlMs", "30000").toLong * 1000000L
  private val markerCache =
    scala.collection.concurrent.TrieMap.empty[String, (Option[Long], Long)]

  private def markerBuckets(plan: LogicalPlan): Option[Long] =
    plan.collectFirst {
      case rel: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        rel.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.headOption.flatMap { root =>
              // cache only present markers (with TTL): absence is never
              // cached — a marker may appear after the first ingest into
              // this path, and the pre-ingest miss is the cheap case
              val now = System.nanoTime()
              markerCache.get(root.toString)
                .collect { case (v, at) if now - at < markerTtlNanos => v }
                .getOrElse {
                  val found =
                    try graft.store.Sidecar.read(
                      new org.apache.hadoop.fs.Path(root, "_graft_buckets"),
                      spark.sparkContext.hadoopConfiguration).map(_.toLong)
                    catch { case _: Exception => None }
                  if (found.isDefined)
                    markerCache.put(root.toString, (found, now))
                  found
                }
            }
          case _ => None
        }
    }.flatten

  private def buckets(child: LogicalPlan): Long =
    markerBuckets(child).getOrElse(
      spark.conf.get("spark.graft.chunkBuckets", "16").toLong)

  /** A document_id equality that constrains the WHOLE filter — i.e. it is
    * one of the top-level conjuncts. An equality nested under Not/Or must
    * NOT trigger injection (e.g. the cascade-delete complement
    * `NOT (document_id = x)` matches every bucket).
    */
  private def docIdEquality(cond: Expression): Option[Literal] =
    splitConjunctivePredicates(cond).collectFirst {
      case EqualTo(a: Attribute, l: Literal)
        if a.name == "document_id" && l.dataType == LongType => l
      case EqualTo(l: Literal, a: Attribute)
        if a.name == "document_id" && l.dataType == LongType => l
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child)
      if child.output.exists(_.name == "doc_bucket") &&
        !cond.references.exists(_.name == "doc_bucket") =>
      docIdEquality(cond) match {
        case Some(idLit) =>
          val bucketAttr = child.output.find(_.name == "doc_bucket").get
          val bucketOfId =
            Pmod(new XxHash64(Seq(idLit)), Literal(buckets(child), LongType))
          val pred = EqualTo(bucketAttr,
            if (bucketAttr.dataType == IntegerType)
              Cast(bucketOfId, IntegerType)
            else bucketOfId)
          Filter(And(cond, pred), child)
        case None => f
      }
  }
}
