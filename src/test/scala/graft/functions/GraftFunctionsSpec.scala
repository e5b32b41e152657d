package graft.functions

import graft.SparkSpec

/** The custom expressions must be callable from raw SQL after
  * registration — the SQL-user path for the engine's operators. */
class GraftFunctionsSpec extends SparkSpec {

  test("custom expressions callable from SQL after register()") {
    GraftFunctions.register(spark)
    graft.GraftSession.registerTables(spark, "/root/testdata/sf0.001",
      Seq("documents", "embeddings"))
    val fp = spark.sql(
      "SELECT doc_fingerprint(text) AS f, size(doc_shingles(text)) AS n FROM documents LIMIT 5")
      .collect()
    assert(fp.length == 5 && fp.forall(r => r.getLong(0) >= 0 && r.getInt(1) > 0))
    val cs = spark.sql(
      """SELECT cosine_sim(a.embedding, b.embedding) AS c
         FROM embeddings a JOIN embeddings b ON a.vec_id = 0 AND b.vec_id = 1""")
      .collect()
    assert(cs.length == 1 && math.abs(cs(0).getDouble(0)) <= 1.0)
    val self = spark.sql(
      "SELECT cosine_sim(embedding, embedding) AS c FROM embeddings LIMIT 3").collect()
    assert(self.forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-9))
    // minhash_sig from SQL == the Column API with the standard family
    val mh = spark.sql(
      """SELECT doc_id, minhash_sig(doc_shingle_vals(text)) AS sig
         FROM documents LIMIT 5""").collect()
    assert(mh.length == 5 && mh.forall(_.getSeq[Any](1).size == 32))
    // doc_simhash16 from SQL == the Column API (one-pass SimHashExpr)
    import org.apache.spark.sql.functions.col
    val sqlSh = spark.sql(
      "SELECT doc_id, doc_simhash16(text) AS h FROM documents")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val apiSh = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), graft.dedup.Dedup.simhash(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sqlSh == apiSh && sqlSh.values.forall(h => h >= 0 && h < (1L << 16)))
  }

  test("extensions class registers the same functions on a fresh session") {
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      // note: getOrCreate may return the existing session; extensions
      // still apply when a genuinely new one is built. Validate via
      // function resolution either way.
      GraftFunctions.register(s2) // belt and braces for shared-session case
      val r = s2.sql("SELECT doc_fingerprint('a b c') AS f").collect()
      assert(r.length == 1)
    } finally ()
  }

  test("perceptual fingerprints callable from SQL: dhash56 (3- and 4-arg) and audio_hash56") {
    GraftFunctions.register(spark)
    // a tiny literal raster: 8x8 gray ramp as binary; SQL vs kernel
    val w = 8; val h = 8
    val rgb = Array.tabulate(w * h * 3)(i => ((i / 3 % w) * 13).toByte)
    import spark.implicits._
    val df = Seq((1L, rgb)).toDF("id", "rgb")
    df.createOrReplaceTempView("rasters")
    val viaSql = spark.sql(s"SELECT dhash56(rgb, $w, $h) AS fp FROM rasters")
      .collect().head.getLong(0)
    assert(viaSql == ImageHash.dhash56(rgb, w, h))
    val rolled = spark.sql(s"SELECT dhash56(rgb, $w, $h, 3) AS fp FROM rasters")
      .collect().head.getLong(0)
    assert(rolled == ImageHash.dhash56(rgb, w, h, 3))
    val pcm = Array.tabulate(300)(i => ((i * 37 % 200) - 100).toShort)
    val adf = Seq((1L, pcm)).toDF("id", "samples")
    adf.createOrReplaceTempView("pcm")
    val aSql = spark.sql("SELECT audio_hash56(samples) AS fp FROM pcm")
      .collect().head.getLong(0)
    assert(aSql == AudioHash.energyHash56(pcm))
    val dot = spark.sql(
      "SELECT int8_dot(CAST(array(1,2,3) AS ARRAY<TINYINT>), CAST(array(4,5,6) AS ARRAY<TINYINT>)) AS d")
      .collect().head.getLong(0)
    assert(dot == 32L)
  }
}
