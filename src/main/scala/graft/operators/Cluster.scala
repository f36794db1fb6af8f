package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.core.Tables
import graft.functions.PortableHash

/** Nearest-centroid assignment over QUANTIZED (integer) vectors as
  * one fused codegen'd kernel: squared-L2 distance to every centroid
  * of the driver-collected codebook, returning
  * `struct(cid, dist)` for the argmin (ties → lowest cid). All
  * arithmetic is BIGINT, so the assignment (and the reported
  * distance) is bit-identical regardless of partitioning, SIMD, or
  * engine — what makes an ITERATIVE clustering loop oracle-checkable.
  * Same design as [[graft.functions.NearestCells]]: the centroid
  * matrix rides along as one reference object instead of a
  * k×dim-literal expression tree. */
case class NearestCentroidSq(child: Expression, cents: Array[Array[Long]])
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("cid", IntegerType, nullable = false),
    StructField("dist", LongType, nullable = false)))
  override def prettyName: String = "nearest_centroid_sq"

  def compute(input: ArrayData): InternalRow = {
    val xs = input.toLongArray()
    var best = 0
    var bestDist = Long.MaxValue
    var k = 0
    while (k < cents.length) {
      val ys = cents(k)
      val m = math.min(xs.length, ys.length)
      var acc = 0L
      var i = 0
      while (i < m) {
        val diff = xs(i) - ys(i)
        acc += diff * diff
        i += 1
      }
      if (acc < bestDist) { bestDist = acc; best = k }
      k += 1
    }
    InternalRow(best, bestDist)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroid", this,
      classOf[NearestCentroidSq].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distributed k-means (Lloyd's iterations) over the embedding
  * corpus — the clustering primitive behind corpus bucketing, IVF
  * coarse quantizers, and topic-shaped data curation.
  *
  * Everything is EXACT-INTEGER fixed point so the whole iterative
  * algorithm hash-matches a pure-SQL oracle (the PageRank
  * discipline applied to ML): vectors quantize once to
  * `floor(x·2²⁰)` BIGINTs (float→double→scale-by-power-of-two is
  * exact IEEE, floor is unambiguous), distances are integer squared
  * L2, and the centroid update is the element-wise integer mean
  * with TRUNCATING division — Java `/`, Spark `DIV` and DuckDB `//`
  * all truncate toward zero, so both engines walk the identical
  * centroid trajectory. Seeds are the k vectors with the smallest
  * portable hash (deterministic, uniformly spread).
  *
  * Scale shape, per iteration: one pass over the cached quantized
  * corpus through the fused [[NearestCentroidSq]] kernel (map-only),
  * then the centroid update aggregates (cid, dim) partial sums
  * map-side — the shuffle carries ≤ k·dim rows per partition no
  * matter the corpus size. The k×dim codebook is collected to the
  * driver each round (bytes, like the IVF codebook at
  * Ann.scala:173) and re-broadcast inside the next round's kernel.
  * At 100 TB nothing in the loop's data flow grows beyond k·dim
  * except the one corpus scan per round.
  */
object Cluster {

  private val Scale = 1048576L // 2^20 quantization

  private def quantized(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * Scale).cast("long")).as("q"))

  private def assignCol(q: Column, cents: Array[Array[Long]]): Column =
    ColumnBridge.column(NearestCentroidSq(ColumnBridge.expression(q), cents))

  def embKmeans(spark: SparkSession, dir: String,
      k: Int = 8, iters: Int = 3): DataFrame =
    kmeansDf(Tables(spark, dir).embeddings, k, iters)

  def kmeansDf(embeddings: DataFrame, k: Int, iters: Int): DataFrame =
    kmeansAssign(embeddings, k, iters)
      .groupBy(col("cid").cast("long").as("cluster_id"))
      .agg(count(lit(1)).as("n"), sum(col("dist")).as("inertia"))
      .orderBy("cluster_id")

  /** The per-vector assignment after the Lloyd's rounds:
    * (vec_id, cid, dist) — the blocking input for semantic dedup
    * and any cluster-routed downstream. */
  def kmeansAssign(embeddings: DataFrame, k: Int, iters: Int): DataFrame = {
    val e = quantized(embeddings).cache()
    try {
      // deterministic seeds: k smallest portable hashes, cid in that order
      var cents: Array[Array[Long]] = e
        .withColumn("h", PortableHash.h60(col("vec_id").cast("string")))
        .orderBy(col("h"), col("vec_id"))
        .limit(k)
        .select(col("q"))
        .collect()
        .map(_.getSeq[Long](0).toArray)
      var assigned: DataFrame = null
      for (r <- 1 to iters) {
        assigned = e.withColumn("a", assignCol(col("q"), cents))
          .select(col("vec_id"), col("q"),
            col("a.cid").as("cid"), col("a.dist").as("dist"))
        if (r < iters) {
          // (cid, dim) sums collapse map-side to ≤ k·dim rows per task
          val sums = assigned
            .select(col("cid"), posexplode(col("q")).as(Seq("d", "v")))
            .groupBy(col("cid"), col("d"))
            .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
            .collect()
          val next = cents.map(_.clone()) // empty cluster keeps its centroid
          sums.foreach { row =>
            next(row.getInt(0))(row.getInt(1)) =
              row.getLong(2) / row.getLong(3) // truncating ≡ DuckDB //
          }
          cents = next
        }
      }
      assigned.select(col("vec_id"), col("cid"), col("dist"))
    } finally e.unpersist()
  }

  /** The WITH-chain reproducing [[kmeansAssign]] in DuckDB, ending at
    * CTE `a<iters>` = (vec_id, cid, dist). Shared by the k-means
    * oracle and the semantic-dedup oracle so the clustering
    * trajectory has exactly ONE SQL statement of truth. */
  def kmeansAssignCtes(k: Int = 8, iters: Int = 3): String = {
    val rounds = (1 to iters).map { r =>
      val assign =
        s"""d$r AS (SELECT x.vec_id, c.cid,
               CAST(sum((x.v - c.v) * (x.v - c.v)) AS BIGINT) AS dist
             FROM x JOIN c${r - 1} c ON x.d = c.d GROUP BY 1, 2),
         a$r AS (SELECT vec_id, cid, dist FROM d$r
             QUALIFY row_number() OVER (PARTITION BY vec_id
                                        ORDER BY dist, cid) = 1)"""
      val update = if (r < iters)
        s""",
         u$r AS (SELECT a.cid, x.d,
               CAST(sum(x.v) // count(*) AS BIGINT) AS v
             FROM a$r a JOIN x ON a.vec_id = x.vec_id GROUP BY 1, 2),
         c$r AS (SELECT p.cid, p.d, coalesce(u.v, p.v) AS v
             FROM c${r - 1} p LEFT JOIN u$r u
               ON p.cid = u.cid AND p.d = u.d)"""
      else ""
      assign + update
    }.mkString(",\n         ")
    s"""e AS (SELECT vec_id,
               list_transform(CAST(embedding AS DOUBLE[]),
                 x -> CAST(floor(x * $Scale) AS BIGINT)) AS q
             FROM embeddings),
         x AS (SELECT vec_id, unnest(q) AS v,
                      unnest(range(len(q))) AS d FROM e),
         seeds AS (SELECT vec_id, row_number() OVER (ORDER BY
                     ('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT,
                     vec_id) - 1 AS cid
                   FROM e QUALIFY cid < $k),
         c0 AS (SELECT s.cid, x.d, x.v
                FROM seeds s JOIN x ON s.vec_id = x.vec_id),
         $rounds"""
  }

  /** The DuckDB oracle: the SAME quantization, seeding, and
    * truncating-integer Lloyd's rounds unrolled as chained CTEs. */
  def kmeansOracleSql(k: Int = 8, iters: Int = 3): String =
    s"""WITH ${kmeansAssignCtes(k, iters)}
         SELECT CAST(cid AS BIGINT) AS cluster_id, count(*) AS n,
                CAST(sum(dist) AS BIGINT) AS inertia
         FROM a$iters GROUP BY 1 ORDER BY 1"""
}
