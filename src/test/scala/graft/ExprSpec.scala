package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expr.{KeccakCore, Registry}
import graft.queries.{LlmOps, TextSim}
import graft.tables.Tables

/** Unit coverage for the custom Catalyst surface (SURVEY.md §7.4):
  * keccak/EIP-55 against published vectors, NGrams generator, cosine
  * expression vs higher-order-function formulation, SimHash and
  * MinHash properties, language-ID heuristic on real multilingual
  * text, IVF recall vs brute force.
  */
class ExprSpec extends AnyFunSuite with SparkFixture {

  test("keccak256 matches published test vectors") {
    assert(KeccakCore.hex(KeccakCore.hash256(Array.emptyByteArray)) ===
      "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
    assert(KeccakCore.hex(KeccakCore.hash256("abc".getBytes("UTF-8"))) ===
      "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")
    assert(KeccakCore.hex(KeccakCore.hash256("testing".getBytes("UTF-8"))) ===
      "5f16f4c7f149ac4f9510d9cf8cf384038ad348b3bcdc01915f95de12df9d1b02")
  }

  test("EIP-55 checksum addresses match the spec vectors") {
    val vectors = Seq(
      "0x5aaeb6053f3e94c9b9a09f33669435e7ef1beaed" -> "0x5aAeb6053F3E94C9b9A09f33669435E7Ef1BeAed",
      "0xfb6916095ca1df60bb79ce92ce3ea74c37c5d359" -> "0xfB6916095ca1df60bB79Ce92cE3Ea74c37c5d359",
      "0xdbf03b407c01e7cd3cbea99509d93f8dddc8c6fb" -> "0xdbF03B407c01E7cD3CBea99509d93f8DDDC8C6FB",
      "0xd1220a0cf47c7b9be7a2e6ba89f429762e7b9adb" -> "0xD1220A0cf47c7B9Be7A2E6BA89F429762e7b9aDb")
    vectors.foreach { case (in, want) =>
      assert(KeccakCore.toChecksumAddress(in) === want)
      // checksumming is idempotent and case-normalizing
      assert(KeccakCore.toChecksumAddress(want) === want)
    }
  }

  test("keccak256/eth_checksum_address work as SQL functions") {
    Registry.ensure(spark)
    val r = spark.sql(
      """SELECT keccak256('Transfer(address,address,uint256)') AS topic0,
        |       eth_checksum_address('0x5aaeb6053f3e94c9b9a09f33669435e7ef1beaed') AS addr"""
        .stripMargin).head()
    // topic0 of the canonical ERC-20 Transfer event signature
    assert(r.getString(0) === "ddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef")
    assert(r.getString(1) === "0x5aAeb6053F3E94C9b9A09f33669435E7Ef1BeAed")
  }

  test("nfc_normalize composes decomposed sequences, idempotent, codegen-safe") {
    Registry.ensure(spark)
    val conf = spark.conf
    val oldFactory = conf.getOption("spark.sql.codegen.factoryMode")
    val oldFallback = conf.getOption("spark.sql.codegen.fallback")
    conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    conf.set("spark.sql.codegen.fallback", "false")
    try {
      // e + COMBINING ACUTE → U+00E9; already-NFC text passes through
      // untouched (the isNormalized fast path returns the SAME object)
      val r = spark.range(1).selectExpr(
        "nfc_normalize(concat('caf', 'e', '\\u0301')) AS composed",
        "length(nfc_normalize(concat('e', '\\u0301'))) AS len1",
        "nfc_normalize(nfc_normalize(concat('e', '\\u0301'))) AS idem",
        "nfc_normalize('plain ascii') AS plain",
        "nfc_normalize(CAST(NULL AS STRING)) AS n").head()
      assert(r.getString(0) === "caf\u00e9")
      assert(r.getInt(1) === 1)
      assert(r.getString(2) === "\u00e9")
      assert(r.getString(3) === "plain ascii")
      assert(r.isNullAt(4))
    } finally {
      oldFactory.fold(conf.unset("spark.sql.codegen.factoryMode"))(v =>
        conf.set("spark.sql.codegen.factoryMode", v))
      oldFallback.fold(conf.unset("spark.sql.codegen.fallback"))(v =>
        conf.set("spark.sql.codegen.fallback", v))
    }
  }

  test("deflate_len matches direct zlib, codegen-safe, orders quality") {
    Registry.ensure(spark)
    // independent computation through the JDK API the expression wraps
    def direct(s: String): Int = {
      val d = new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
      d.setInput(s.getBytes("UTF-8")); d.finish()
      val buf = new Array[Byte](8192)
      var n = 0
      while (!d.finished()) n += d.deflate(buf)
      d.end(); n
    }
    val repetitive = "spam " * 200          // LZ77 collapses this
    val prose = (1 to 200).map(i => s"w${i * 7919 % 997}").mkString(" ")
    val conf = spark.conf
    val oldFactory = conf.getOption("spark.sql.codegen.factoryMode")
    val oldFallback = conf.getOption("spark.sql.codegen.fallback")
    def lens(mode: String): (Int, Int, Boolean) = {
      conf.set("spark.sql.codegen.factoryMode", mode)
      val r = spark.sql(
        s"""SELECT deflate_len('${repetitive}') AS a,
           |       deflate_len('${prose}') AS b,
           |       deflate_len(CAST(NULL AS STRING)) IS NULL AS n""".stripMargin)
        .head()
      (r.getInt(0), r.getInt(1), r.getBoolean(2))
    }
    try {
      conf.set("spark.sql.codegen.fallback", "false")
      val (ra, rb, rn) = lens("CODEGEN_ONLY")
      val (ia, ib, in) = lens("NO_CODEGEN")
      // interpreted == generated == independent JDK computation
      assert((ra, rb) === (ia, ib))
      assert(ra === direct(repetitive) && rb === direct(prose))
      assert(rn && in)
      // the quality ordering the ratio key relies on: repetitive text
      // compresses ~an order of magnitude below varied text
      assert(ra * 5 < rb, s"repetitive $ra should be << varied $rb")
      assert(rb < prose.getBytes("UTF-8").length)
    } finally {
      oldFactory.fold(conf.unset("spark.sql.codegen.factoryMode"))(v =>
        conf.set("spark.sql.codegen.factoryMode", v))
      oldFallback.fold(conf.unset("spark.sql.codegen.fallback"))(v =>
        conf.set("spark.sql.codegen.fallback", v))
    }
  }

  test("ngrams generator emits consecutive windows") {
    Registry.ensure(spark)
    import spark.implicits._
    val out = Seq("a b c d").toDF("text")
      .select(expr("ngrams(split(text, ' '), 2)").as("g"))
      .collect().map(_.getString(0)).toSeq
    assert(out === Seq("a b", "b c", "c d"))
    val tri = Seq("a b c d").toDF("text")
      .select(expr("ngrams(split(text, ' '), 3)").as("g"))
      .collect().map(_.getString(0)).toSeq
    assert(tri === Seq("a b c", "b c d"))
    // shorter than n → no rows
    assert(Seq("a").toDF("text")
      .select(expr("ngrams(split(text, ' '), 2)")).count() === 0)
  }

  test("cosine_sim expression equals the higher-order-function formulation") {
    Registry.ensure(spark)
    val e = Tables.embeddings(spark, sf).limit(50)
    val a = e.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
    val b = e.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
    val both = a.crossJoin(b)
      .select(
        expr("cosine_sim(a_emb, b_emb)").as("expr_cos"),
        LlmOps.cosine(col("a_emb"), col("b_emb")).as("hof_cos"))
    val diffs = both.select(max(abs(col("expr_cos") - col("hof_cos")))).head().getDouble(0)
    assert(diffs === 0.0, s"max |expr-hof| = $diffs")
  }

  test("fused projection of repeated/mixed custom exprs compiles (no interpreter fallback)") {
    // Two cosine_sim calls (plus minhash+simhash on the same row) fused
    // into ONE generated projection: every Java local in doGenCode must be
    // ctx.freshName'd or Janino dies with "Redefinition of local variable"
    // and Spark silently de-optimizes to interpreted eval. CODEGEN_ONLY +
    // fallback=false turn that silent fallback into a test failure.
    Registry.ensure(spark)
    val conf = spark.conf
    val oldFactory = conf.getOption("spark.sql.codegen.factoryMode")
    val oldFallback = conf.getOption("spark.sql.codegen.fallback")
    conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    conf.set("spark.sql.codegen.fallback", "false")
    try {
      // range()-derived input so the projection can't constant-fold away
      val df = spark.range(1, 17).selectExpr(
        "transform(sequence(0, 7), j -> cast(id * (j + 1) as float)) AS v",
        "transform(sequence(0, 7), j -> cast((id + 1) * (j + 2) as float)) AS w",
        "split(concat('tok', id, ' tok', id + 1, ' tok', id + 2), ' ') AS toks")
      val out = df.selectExpr(
        "cosine_sim(v, w) AS c1",
        "cosine_sim(w, v) AS c2",
        "minhash_sig(toks, 16) AS mh",
        "simhash64(toks) AS sh",
        "simhash64(toks) AS sh2").collect()
      assert(out.length === 16)
      out.foreach { r =>
        if (!r.isNullAt(0)) {
          assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12)
          assert(r.getDouble(0) <= 1.0 + 1e-12)
        }
        assert(r.getSeq[Long](2).length === 16)
        assert(r.getLong(3) === r.getLong(4))
      }
    } finally {
      oldFactory.fold(conf.unset("spark.sql.codegen.factoryMode"))(v =>
        conf.set("spark.sql.codegen.factoryMode", v))
      oldFallback.fold(conf.unset("spark.sql.codegen.fallback"))(v =>
        conf.set("spark.sql.codegen.fallback", v))
    }
  }

  test("cosine_sim is 1 on itself and within [-1, 1]") {
    Registry.ensure(spark)
    val e = Tables.embeddings(spark, sf)
    val self = e.select(expr("cosine_sim(embedding, embedding)").as("c"))
    assert(self.filter(abs(col("c") - 1.0) > 1e-12).count() === 0)
    val a = e.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
    val b = e.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
    val pairs = a.crossJoin(b).select(expr("cosine_sim(a_emb, b_emb)").as("c"))
    assert(pairs.filter(col("c") > 1.0 + 1e-12 || col("c") < -1.0 - 1e-12).count() === 0)
  }

  test("simhash64 is deterministic and order-insensitive; near-dups are close") {
    Registry.ensure(spark)
    import spark.implicits._
    val df = Seq(
      ("a", "spark shuffle join hash partition broadcast"),
      ("b", "broadcast partition hash join shuffle spark"), // permuted
      ("c", "spark shuffle join hash partition merge"),     // 1 token changed
      ("d", "completely different words entirely unrelated content")
    ).toDF("id", "text").select(col("id"), expr("simhash64(split(text, ' '))").as("fp"))
    val m = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("a") === m("b"))
    def hamming(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(hamming(m("a"), m("c")) < hamming(m("a"), m("d")),
      s"near-dup ${hamming(m("a"), m("c"))} vs unrelated ${hamming(m("a"), m("d"))}")
  }

  test("minhash_lsh candidates achieve high recall on true near-duplicates") {
    val cands = TextSim.queries("q_minhash_lsh")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground truth: same-lang pairs with exact token-set Jaccard >= 0.8
    val tok = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), explode(array_distinct(split(col("text"), " "))).as("tok"))
    val sz = tok.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val aT = tok.select(col("lang"), col("tok"), col("doc_id").as("a_id"))
    val bT = tok.select(col("lang").as("lb"), col("tok").as("tb"), col("doc_id").as("b_id"))
    val truth = aT.join(bT, col("lang") === col("lb") && col("tok") === col("tb") &&
        col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("inter"))
      .join(sz.withColumnRenamed("doc_id", "a_id").withColumnRenamed("n", "na"), "a_id")
      .join(sz.withColumnRenamed("doc_id", "b_id").withColumnRenamed("n", "nb"), "b_id")
      .filter(col("inter") / (col("na") + col("nb") - col("inter")) >= 0.8)
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "test needs some true near-dup pairs")
    val recall = truth.count(cands.contains).toDouble / truth.size
    assert(recall >= 0.9, s"recall $recall over ${truth.size} true pairs")
  }

  test("language-ID heuristic identifies real multilingual text") {
    import spark.implicits._
    val df = Seq(
      ("the cat and the dog went to the house", "en"),
      ("der hund und die katze ist hier", "de"),
      ("el perro y la casa es grande", "es"),
      ("le chien et la maison est grande", "fr"),
      ("数据库查询", "zh"),
      ("zzz qqq xxx", "und")
    ).toDF("text", "want")
    val bad = df.withColumn("pred", TextSim.langId(col("text")))
      .filter(col("pred") =!= col("want"))
    assert(bad.isEmpty, bad.collect().mkString(", "))
  }

  test("IVF probe result overlaps brute-force top-10") {
    val brute = LlmOps.queries("q_sim_cosine_topk")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val ivf = TextSim.queries("q_sim_ivf")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val overlap = (brute & ivf).size
    assert(overlap >= 5, s"IVF recall too low: $overlap/10")
  }

  test("multimodal decode stub derives metadata partition-parallel") {
    val decoded = graft.multimodal.Multimodal.decodeStub(spark, sf)
    val docs = Tables.documents(spark, sf).count()
    assert(decoded.count() === docs)
    val bad = decoded.filter(
      col("width") =!= (lit(64) + col("n_bytes") % 64) ||
      col("height") =!= (lit(64) + (col("n_bytes") / 64).cast("int") % 64) ||
      col("channels") =!= 3)
    assert(bad.isEmpty)
  }
}
