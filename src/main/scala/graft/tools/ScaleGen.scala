package graft.tools

import graft.Graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up generator: reads a driver testdata directory
  * (TESTDATA.md schema) and writes a factor-F copy with the same schema,
  * dense key spaces, and referential integrity, for scale-step validation
  * (VERDICT r06 item 1: measure the plans across a 10x step instead of
  * asserting from shapes).
  *
  * Design: every scalable table is exploded into F replicas; replica r of
  * a row gets key' = key + r*N (N = source key-space size, keys are dense
  * 0..N-1 in the driver data), so key spaces stay dense and foreign keys
  * remapped with the SAME arithmetic still resolve. FK replica choice is
  * hash-mixed (pmod(r + key, F)) so the F replicas don't form disconnected
  * sub-universes. Content perturbation is structure-preserving:
  *
  *  - documents.text: per-replica vocabulary ROTATION (a true permutation
  *    of the ~31-word synthetic vocab). Replica 0 is the original corpus;
  *    replica r relabels each word by vocab[(idx + 7r) mod V]. Within a
  *    replica, exact-dup / near-dup / Jaccard / shingle structure is
  *    ISOMORPHIC to the source corpus (dedup workloads scale exactly
  *    linearly); across replicas, word sets are disjoint-ish so no
  *    artificial near-dup pairs appear.
  *  - embeddings.embedding: per-replica cyclic rotation of the 64-dim
  *    vector (norm- and inner-product-preserving within a replica;
  *    cross-replica dots decorrelate).
  *  - timestamps / measures / categoricals: unchanged (distributions are
  *    preserved exactly, F-fold).
  *
  * Output matches the driver layout one parquet path per table; timestamp
  * columns stay TIMESTAMP_NTZ so the physical type (timestamp[us], not
  * UTC-adjusted) round-trips identically for the DuckDB oracle.
  *
  * Usage: runMain graft.tools.ScaleGen <srcDir> <dstDir> [factor=10]
  */
object ScaleGen {

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val f = if (args.length > 2) args(2).toInt else 10
    val spark = Graft.session(cores = 32, appName = "graft-scalegen")
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    generate(spark, src, dst, f)
    spark.stop()
  }

  def generate(spark: SparkSession, src: String, dst: String, f: Int): Unit = {
    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String, files: Int): Unit =
      df.repartition(files).write.mode("overwrite")
        .parquet(s"$dst/$t.parquet")

    // source key-space sizes (keys are dense 0..N-1 in the driver data)
    def keySpace(t: String, key: String): Long =
      read(t).agg(max(col(key))).head().getLong(0) + 1L
    val nCust = keySpace("customer", "c_custkey")
    val nSupp = keySpace("supplier", "s_suppkey")
    val nPart = keySpace("part", "p_partkey")
    val nOrd = keySpace("orders", "o_orderkey")
    val nEvt = keySpace("events", "event_id")
    val nDoc = keySpace("documents", "doc_id")
    val nVec = keySpace("embeddings", "vec_id")
    // events.user_id's FK domain is c_custkey (the hs2 join), so its
    // replication stride must be nCust, not max(user_id)+1 — with a
    // user_id-derived stride, any customer absent from events would make
    // scaled user_ids land on replica-crossing customer keys and shift
    // user→customer attribution. Loud check that the domain really nests.
    val maxUser = read("events").agg(max(col("user_id"))).head().getLong(0)
    require(maxUser < nCust,
      s"events.user_id max $maxUser outside customer key space $nCust")

    val reps = explode(sequence(lit(0), lit(f - 1))).as("r")
    def r = col("r").cast("long")
    // FK replica choice: mixed but deterministic, lands on a valid key
    def mix(key: org.apache.spark.sql.Column) = pmod(r + key, lit(f.toLong))

    // dimension tables too small to split: byte-copy semantics via rewrite
    write(read("region"), "region", 1)
    write(read("nation"), "nation", 1)

    write(
      read("customer").withColumn("r", reps)
        .withColumn("c_custkey", col("c_custkey") + r * nCust)
        .withColumn("c_name", format_string("Customer#%09d", col("c_custkey")))
        .drop("r"),
      "customer", 2)

    write(
      read("supplier").withColumn("r", reps)
        .withColumn("s_suppkey", col("s_suppkey") + r * nSupp)
        .withColumn("s_name", format_string("Supplier#%09d", col("s_suppkey")))
        .drop("r"),
      "supplier", 1)

    write(
      read("part").withColumn("r", reps)
        .withColumn("p_partkey", col("p_partkey") + r * nPart)
        .drop("r"),
      "part", 2)

    write(
      read("orders").withColumn("r", reps)
        .withColumn("o_orderkey", col("o_orderkey") + r * nOrd)
        .withColumn("o_custkey", col("o_custkey") + mix(col("o_custkey")) * nCust)
        .drop("r"),
      "orders", 4)

    write(
      read("lineitem").withColumn("r", reps)
        // same-replica orderkey keeps orders<->lineitem integrity exact
        .withColumn("l_orderkey", col("l_orderkey") + r * nOrd)
        .withColumn("l_partkey", col("l_partkey") + mix(col("l_orderkey")) * nPart)
        .withColumn("l_suppkey", col("l_suppkey") + mix(col("l_partkey")) * nSupp)
        .drop("r"),
      "lineitem", 16)

    write(
      read("events").withColumn("r", reps)
        .withColumn("event_id", col("event_id") + r * nEvt)
        .withColumn("user_id", col("user_id") + mix(col("event_id")) * nCust)
        .drop("r"),
      "events", 4)

    // documents: per-replica vocab rotation (see scaladoc)
    val vocab: Array[String] = read("documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .where(col("w") =!= "").distinct()
      .orderBy("w").collect().map(_.getString(0))
    require(vocab.length < 100000, s"vocab unexpectedly large: ${vocab.length}")
    val v = vocab.length
    val vocabArr = array(vocab.map(lit): _*)
    val idxMap = map(vocab.zipWithIndex.flatMap {
      case (w, i) => Seq(lit(w), lit(i)) }: _*)
    val rotated = array_join(
      transform(split(col("text"), " "), w =>
        coalesce(
          element_at(vocabArr,
            (pmod(element_at(idxMap, w) + lit(7) * r, lit(v)) + 1)
              .cast("int")),
          w)),
      " ")
    write(
      read("documents").withColumn("r", reps)
        .withColumn("doc_id", col("doc_id") + r * nDoc)
        .withColumn("text", rotated)
        .withColumn("n_chars", length(col("text")).cast("long"))
        .drop("r"),
      "documents", 2)

    // embeddings: cyclic rotation by 13r mod dim (norm-preserving)
    val dim = read("embeddings").select(size(col("embedding"))).head().getInt(0)
    val k = pmod(r * 13, lit(dim.toLong)).cast("int")
    write(
      read("embeddings").withColumn("r", reps)
        .withColumn("vec_id", col("vec_id") + r * nVec)
        .withColumn("embedding",
          concat(slice(col("embedding"), k + 1, lit(dim) - k),
                 slice(col("embedding"), lit(1), k)))
        .drop("r"),
      "embeddings", 1)

    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      val n = spark.read.parquet(s"$dst/$t.parquet").count()
      println(s"[scalegen] $t: $n rows")
    }
  }
}
