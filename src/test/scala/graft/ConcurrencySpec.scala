package graft

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Proves the documented thread-safety contract (Similarity scaladoc):
  * index builders re-register fixed-name session temp functions, so
  * CONCURRENT builds must run in separate sessions — and with
  * `spark.newSession()` per thread they reproduce the sequential
  * results bit-for-bit. Also pins the cache-scope side: pending
  * persists are tracked per THREAD, so parallel builders cannot steal
  * or leak each other's scoped intermediates.
  */
class ConcurrencySpec extends SparkSpec {

  private def resultSet(df: DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getAs[Long]("probe_id"),
      r.getAs[Long]("neighbor_id"),
      // 1e-9 quantized score: bit-stable across identical plans, and
      // coarse enough to ignore nothing — full doubles compare equal
      // in practice, this just keeps the assertion's intent (same
      // RANKED pairs with same scores) explicit
      math.round(r.getAs[Double]("cosine") * 1e9))).toSet

  test("concurrent ANN index builds in isolated sessions match sequential runs") {
    // sequential baselines on the shared root session
    val emb = Tables.embeddings(spark, sfDir)
    val probes = emb.filter(col("vec_id") < 10)
    val baseIvf = resultSet(Similarity.ivfTopK(probes, emb, 5, nprobe = 2))
    val basePq = resultSet(Similarity.pqTopK(probes, emb, 5))
    Caches.drain()
    spark.catalog.clearCache()
    // the same two builds, CONCURRENTLY, one isolated session each —
    // interleaved registration of graft_nearest_cents/graft_pq_codes/
    // graft_pq_cosine on a SHARED session is exactly the documented
    // unsupported pattern; newSession() gives each thread its own
    // function registry while sharing the SparkContext
    def build(f: (DataFrame, DataFrame) => DataFrame): Future[Set[(Long, Long, Long)]] =
      Future {
        val s = spark.newSession()
        val e = Tables.embeddings(s, sfDir)
        val out = resultSet(f(e.filter(col("vec_id") < 10), e))
        Caches.drain() // this thread's scoped persists
        out
      }
    val fIvf = build((p, e) => Similarity.ivfTopK(p, e, 5, nprobe = 2))
    val fPq = build((p, e) => Similarity.pqTopK(p, e, 5))
    assert(Await.result(fIvf, 180.seconds) == baseIvf,
      "concurrent IVF build diverged from the sequential run")
    assert(Await.result(fPq, 180.seconds) == basePq,
      "concurrent PQ build diverged from the sequential run")
    spark.catalog.clearCache()
  }

  test("parallel read-only queries on one shared session are safe") {
    // Plain DataFrame queries (no session temp-function registration)
    // have no per-session mutable state: N threads over ONE session
    // must agree with the sequential answers. This is the supported
    // multi-tenant embedding: one session, many readers.
    val expected = (1 to 4).map { k =>
      Tables.lineitem(spark, sfDir)
        .filter(col("l_quantity") >= k * 10)
        .agg(count(lit(1)), sum(col("l_extendedprice").cast("decimal(18,2)")))
        .collect()(0).toSeq
    }
    val got = Await.result(
      Future.sequence((1 to 4).map { k =>
        Future {
          Tables.lineitem(spark, sfDir)
            .filter(col("l_quantity") >= k * 10)
            .agg(count(lit(1)), sum(col("l_extendedprice").cast("decimal(18,2)")))
            .collect()(0).toSeq
        }
      }), 180.seconds)
    assert(got == expected)
  }
}
