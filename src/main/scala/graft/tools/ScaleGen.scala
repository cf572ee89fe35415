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
  * Round-11 additions:
  *  - docMode "heaps": instead of rotating the FIXED vocabulary (which
  *    saturates — every replica reuses the same ~31 words, so shingle
  *    document frequencies grow linearly in F and pair-probe volumes
  *    quadratically), replica r > 0 renames a deterministic fraction p
  *    of the vocabulary to replica-private tokens, with p chosen so
  *    total word vocab ≈ V0·F^0.7 (Heaps' law). Within a replica the
  *    word map is injective, so dedup/Jaccard/shingle structure stays
  *    ISOMORPHIC to the source corpus; across replicas most shingles
  *    differ (a k-word shingle collides only if all k words stayed
  *    shared), so the shingle vocabulary grows near-linearly in F —
  *    the realistic corpus shape the r10 verdict asked to measure
  *    against.
  *  - a table filter, for narrow scale steps (e.g. events-only sf100)
  *    that don't need the full fixture's disk.
  *
  * Usage: runMain graft.tools.ScaleGen <srcDir> <dstDir> [factor=10]
  *          [docMode=rotate|heaps] [tables=a,b,c]
  */
object ScaleGen {

  val AllTables: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val f = if (args.length > 2) args(2).toInt else 10
    val mode = if (args.length > 3) args(3) else "rotate"
    val only = if (args.length > 4) args(4).split(',').toSet
               else AllTables.toSet
    val spark = Graft.session(cores = 32, appName = "graft-scalegen")
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    generate(spark, src, dst, f, mode, only)
    spark.stop()
  }

  def generate(spark: SparkSession, src: String, dst: String, f: Int,
               docMode: String = "rotate",
               only: Set[String] = AllTables.toSet): Unit = {
    require(Set("rotate", "heaps")(docMode), s"unknown docMode '$docMode'")
    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    // by-name df: a filtered-out table never builds its plan (or forces
    // the lazy key spaces it references)
    def write(df: => DataFrame, t: String, files: Int): Unit =
      if (only(t)) df.repartition(files).write.mode("overwrite")
        .parquet(s"$dst/$t.parquet")

    // source key-space sizes (keys are dense 0..N-1 in the driver
    // data); lazy so a narrow table filter reads only what it scales
    def keySpace(t: String, key: String): Long =
      read(t).agg(max(col(key))).head().getLong(0) + 1L
    lazy val nCust = keySpace("customer", "c_custkey")
    lazy val nSupp = keySpace("supplier", "s_suppkey")
    lazy val nPart = keySpace("part", "p_partkey")
    lazy val nOrd = keySpace("orders", "o_orderkey")
    lazy val nEvt = keySpace("events", "event_id")
    lazy val nDoc = keySpace("documents", "doc_id")
    lazy val nVec = keySpace("embeddings", "vec_id")
    // events.user_id's FK domain is c_custkey (the hs2 join), so its
    // replication stride must be nCust, not max(user_id)+1 — with a
    // user_id-derived stride, any customer absent from events would make
    // scaled user_ids land on replica-crossing customer keys and shift
    // user→customer attribution. Loud check that the domain really nests.
    if (only("events")) {
      val maxUser = read("events").agg(max(col("user_id"))).head().getLong(0)
      require(maxUser < nCust,
        s"events.user_id max $maxUser outside customer key space $nCust")
    }

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

    // documents: per-replica vocab rotation, or Heaps-law growth
    // (docMode "heaps" — see scaladoc)
    if (only("documents")) {
      val vocab: Array[String] = read("documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .where(col("w") =!= "").distinct()
        .orderBy("w").collect().map(_.getString(0))
      require(vocab.length < 100000, s"vocab unexpectedly large: ${vocab.length}")
      val v = vocab.length
      val vocabArr = array(vocab.map(lit): _*)
      val idxMap = map(vocab.zipWithIndex.flatMap {
        case (w, i) => Seq(lit(w), lit(i)) }: _*)
      val newText = docMode match {
        case "rotate" => array_join(
          transform(split(col("text"), " "), w =>
            coalesce(
              element_at(vocabArr,
                (pmod(element_at(idxMap, w) + lit(7) * r, lit(v)) + 1)
                  .cast("int")),
              w)),
          " ")
        case "heaps" =>
          // rename fraction p per replica r>0 so total word vocab
          // ≈ V0·(1 + p·(F−1)) = V0·F^0.7; the (word, replica) choice
          // is a deterministic hash, the per-replica map injective
          // (suffixed tokens can't collide with the base vocab)
          val p = if (f <= 1) 0.0
                  else (math.pow(f.toDouble, 0.7) - 1.0) / (f - 1.0)
          val pm = math.round(p * 1000.0)
          println(f"[scalegen] heaps mode: rename fraction p=$p%.3f " +
            s"→ expected vocab ≈ ${math.round(v * math.pow(f, 0.7))}")
          array_join(
            transform(split(col("text"), " "), w =>
              when(w === "" || element_at(idxMap, w).isNull, w)
                .when(r > 0 &&
                  pmod(xxhash64(element_at(idxMap, w).cast("long"), r),
                    lit(1000L)) < lit(pm),
                  concat(w, lit("g"), r))
                .otherwise(w)),
            " ")
      }
      write(
        read("documents").withColumn("r", reps)
          .withColumn("doc_id", col("doc_id") + r * nDoc)
          .withColumn("text", newText)
          .withColumn("n_chars", length(col("text")).cast("long"))
          .drop("r"),
        "documents", 2)
    }

    // embeddings: cyclic rotation by 13r mod dim (norm-preserving)
    if (only("embeddings")) {
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
    }

    AllTables.filter(only).foreach { t =>
      val n = spark.read.parquet(s"$dst/$t.parquet").count()
      println(s"[scalegen] $t: $n rows")
    }
  }
}
