// Skew soak for q_triangle_count's orientation bound (round 10).
// Crafts a CELEBRITY part: one synthetic part added to EVERY order at
// sf0.1 (degree = V-1 — the "bestseller" every market basket has).
// Degree-ordered orientation puts the celebrity LAST in the (deg, id)
// order, so all its ~20k edges point INTO it: its out-list is empty,
// it contributes no intersection sources, and its triangles (one per
// organic edge — both endpoints always co-sell with it) are found at
// their cheap corners. The soak asserts the boosted run stays in the
// organic run's cost band instead of going quadratic in the hot
// degree.
// Run: /opt/spark/bin/spark-shell --master local[32] --driver-memory 24g \
//        --driver-class-path target/scala-2.13/classes -I scripts/soak_tri_r10.scala
import org.apache.spark.sql.functions._

spark.conf.set("spark.sql.shuffle.partitions", "32")
spark.sparkContext.setLogLevel("ERROR")
val dir = "/root/testdata/sf0.1"

def t[A](tag: String)(f: => A): A = {
  val t0 = System.nanoTime; val r = f
  println(f"SOAK $tag: ${(System.nanoTime - t0) / 1e9}%.2f s"); r
}

t("organic cold")(graft.operators.Graph.triangleCount(spark, dir).write.format("noop").mode("overwrite").save())

val li = graft.Tables.lineitem(spark, dir)
val celeb = li.select(col("l_orderkey")).distinct().withColumn("l_partkey", lit(1000000000L))
val boosted = li.select("l_orderkey", "l_partkey").union(celeb.select("l_orderkey", "l_partkey"))
println(s"SOAK orders=${celeb.count()}, lineitem rows=${boosted.count()}")

def triOf(rows: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
  val pairGen = """flatten(transform(ps, (p, i) ->
    transform(slice(ps, i + 2, size(ps)), q -> struct(p AS x, q AS y))))"""
  val e = rows.groupBy(col("l_orderkey")).agg(sort_array(collect_set(col("l_partkey"))).as("ps")).select(explode(expr(pairGen)).as("e")).select(col("e.x").as("x"), col("e.y").as("y")).distinct().cache()
  val deg = e.select(col("x").as("node")).union(e.select(col("y").as("node"))).groupBy("node").agg(count(lit(1)).as("deg")).cache()
  val withDeg = e.join(broadcast(deg.withColumnRenamed("node", "x").withColumnRenamed("deg", "dx")), "x").join(broadcast(deg.withColumnRenamed("node", "y").withColumnRenamed("deg", "dy")), "y")
  val oriented = withDeg.select(when(struct(col("dx"), col("x")) < struct(col("dy"), col("y")), struct(col("x").as("u"), col("y").as("v"))).otherwise(struct(col("y").as("u"), col("x").as("v"))).as("o")).select(col("o.u").as("u"), col("o.v").as("v")).cache()
  val adj = oriented.groupBy(col("u").as("node")).agg(sort_array(collect_list(col("v"))).as("nbrs")).cache()
  val closers = oriented.join(adj.select(col("node").as("u"), col("nbrs").as("nu")), Seq("u")).join(adj.select(col("node").as("v"), col("nbrs").as("nv")), Seq("v")).select(col("u"), col("v"), array_intersect(col("nu"), col("nv")).as("ws")).filter(size(col("ws")) > 0)
  val uv = closers.select(explode(array(col("u"), col("v"))).as("part_id"), size(col("ws")).cast("long").as("n"))
  val w = closers.select(explode(col("ws")).as("part_id"), lit(1L).as("n"))
  uv.union(w).groupBy("part_id").agg(sum("n").as("n_tri"))
}

val boostedTri = t("celebrity cold")({ val d = triOf(boosted).cache(); d.write.format("noop").mode("overwrite").save(); d })
println(s"SOAK celebrity triangle count: ${boostedTri.filter(col("part_id") === 1000000000L).collect().map(_.getLong(1)).mkString}")
t("celebrity warm")(boostedTri.write.format("noop").mode("overwrite").save())
sys.exit(0)
