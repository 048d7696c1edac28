package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic distributed k-means (Lloyd's) over an embedding column —
  * the learned-quantizer companion to [[Similarity]]'s fixed-cell IVF and
  * the clustering stage of SemDeDup-style curation (Abbas et al. 2023
  * cluster with k-means FIRST, then near-dedup within clusters; Tirumala
  * et al. 2023 "D4" likewise k-means-cluster before SemDeDup+SSL-prototype
  * pruning).
  *
  * Scale design — the canonical Spark k-means shape (same as MLlib's, but
  * declarative so Catalyst keeps the per-iteration pass in whole-stage
  * codegen):
  *   - each iteration is ONE scan of the (persisted) vectors: assignment
  *     is a per-row expression over k broadcast-literal centroids (no
  *     join, no shuffle of the fact table), and the recompute is a
  *     k-group aggregate whose partial sums combine map-side — k×dim
  *     doubles cross the wire per partition, independent of row count;
  *   - centroids live on the driver between iterations (k×dim doubles —
  *     bytes, not data), exactly what `broadcast` would ship anyway;
  *   - determinism: init is the k lowest-id vectors, ties in the argmin
  *     break to the lowest cluster id (struct ordering on (dist², id)),
  *     and each recomputed centroid coordinate is rounded to 6 decimals —
  *     a cross-engine fixed-point trick: per-dimension means differ across
  *     engines only in the last ulp from aggregation order, so rounding
  *     makes every subsequent iteration's inputs bit-identical, which is
  *     what lets DuckDB replay the whole run (`kmeans_clusters` gate)
  *     and makes re-runs on re-partitioned data reproducible at 100 TB.
  *
  * Distances fold left-to-right in double (`zip_with` + `aggregate`), the
  * same sequential accumulation DuckDB's `list_distance` uses, so the
  * argmin compares identical IEEE doubles on both engines.
  */
object Clustering {

  /** Squared L2 distance from the vector column to one literal centroid,
    * sequential double fold. */
  private def dist2(v: Column, c: Seq[Double]): Column =
    aggregate(zip_with(v, array(c.map(lit): _*), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** Lloyd's k-means: `iters` assign/recompute rounds from a lowest-k-ids
    * init, then a final assignment. Returns one row per input vector:
    * (idCol, cluster, dist) with dist = round(L2 to its centroid, 6).
    * Empty clusters drop out of later iterations (ids keep their original
    * index — parity with a GROUP BY recompute on any engine). */
  def kmeansAssign(vectors: DataFrame, k: Int, iters: Int, dim: Int = 64,
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val v = vectors.select(col(idCol).as("id"),
      transform(col(vecCol), _.cast("double")).as("v"))

    def assignExpr(cents: Seq[(Int, Seq[Double])]): Column =
      array_min(array(cents.map { case (cid, c) =>
        struct(dist2(col("v"), c).as("d"), lit(cid).as("cluster"))
      }: _*))

    graft.core.Caching.withCached(v) {
      // init: the k lowest-id vectors, cluster id = rank in id order
      var cents: Seq[(Int, Seq[Double])] = v.orderBy("id").limit(k).collect()
        .zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](1)) }.toSeq
      var it = 0
      while (it < iters) {
        val dimAvgs = (0 until dim).map(j =>
          round(avg(element_at(col("v"), j + 1)), 6).as(s"d$j"))
        cents = v.withColumn("cluster", assignExpr(cents).getField("cluster"))
          .groupBy("cluster").agg(dimAvgs.head, dimAvgs.tail: _*)
          .collect()
          .map(r => (r.getInt(0), (0 until dim).map(j => r.getDouble(j + 1))))
          .sortBy(_._1).toSeq
        it += 1
      }
      v.withColumn("best", assignExpr(cents))
        .select(col("id").as(idCol), col("best.cluster").as("cluster"),
          round(sqrt(col("best.d")), 6).as("dist"))
        .localCheckpoint() // pin: the cached `v` unpersists when this scope exits
    }
  }

  /** DuckDB replication of [[kmeansAssign]] — the same unrolled run as one
    * statement (generated here so gate and operator share k/iters). */
  def kmeansOracleSql(k: Int, iters: Int, table: String = "embeddings",
                      idCol: String = "vec_id", vecCol: String = "embedding"): String = {
    val init =
      s"""c0 AS (SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS INT) AS cluster, v AS c
         |  FROM (SELECT id, v FROM v ORDER BY id LIMIT $k))""".stripMargin
    def assign(i: Int) =
      s"""(SELECT id, cluster, d FROM (
         |    SELECT v.id, c.cluster, list_distance(v.v, c.c) AS d,
         |      row_number() OVER (PARTITION BY v.id ORDER BY list_distance(v.v, c.c), c.cluster) AS rn
         |    FROM v CROSS JOIN c$i c) WHERE rn = 1)""".stripMargin
    val steps = (0 until iters).map { i =>
      s"""a$i AS ${assign(i)},
         |c${i + 1} AS (SELECT cluster, list(m ORDER BY j) AS c FROM (
         |    SELECT cluster, j, round(avg(x), 6) AS m FROM (
         |      SELECT a$i.cluster AS cluster, generate_subscripts(v.v, 1) AS j, unnest(v.v) AS x
         |      FROM a$i JOIN v USING (id)) GROUP BY cluster, j) GROUP BY cluster)""".stripMargin
    }
    s"""WITH v AS (SELECT $idCol AS id, CAST($vecCol AS DOUBLE[]) AS v FROM $table),
       |${(init +: steps).mkString(",\n")}
       |SELECT id AS $idCol, cluster, round(d, 6) AS dist
       |FROM ${assign(iters)}
       |ORDER BY $idCol""".stripMargin
  }
}
