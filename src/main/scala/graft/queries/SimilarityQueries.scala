package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.pipeline.{MediaFixtures, Multimodal, Similarity}

/** Similarity-search + multimodal queries over the `embeddings` /
  * `documents` tables.
  */
object SimilarityQueries {

  private val dvecSql = "list_transform(%s, x -> CAST(x AS DOUBLE))"

  val qs: Seq[Q] = Seq(

    // ---- exact pairwise cosine WITHIN a required blocking key (the API's
    // guard against accidental whole-corpus O(n^2)); the modulo block keeps
    // the work parallel across partitions (a constant block would funnel
    // the whole self-join into one task) and is mirrored exactly in the
    // oracle. The LSH/IVF paths below are the scale path.
    Q("q32_embedding_neardup",
      Some("SELECT a.vec_id AS id_a, b.vec_id AS id_b, " +
        s"round(list_cosine_similarity(${dvecSql.format("a.embedding")}, ${dvecSql.format("b.embedding")}), 6) AS cos " +
        "FROM embeddings a JOIN embeddings b " +
        // ((x % 8) + 8) % 8 mirrors Spark's pmod even for negative ids
        // (DuckDB's % keeps the sign)
        "ON ((a.vec_id % 8 + 8) % 8) = ((b.vec_id % 8 + 8) % 8) AND a.vec_id < b.vec_id " +
        s"WHERE list_cosine_similarity(${dvecSql.format("a.embedding")}, ${dvecSql.format("b.embedding")}) >= 0.35 " +
        "ORDER BY id_a, id_b"),
      (s, dir) => Similarity.cosineNearDupPairs(Tables.embeddings(s, dir), 0.35,
          blockCol = pmod(col("vec_id"), lit(8)))
        .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
        .orderBy("id_a", "id_b")),

    // ---- the LSH scale path for the same task, ORACLE-CHECKED end to
    // end (the q30 discipline brought to hyperplanes): md5-seeded
    // INTEGER plane coefficients over floor(x·2^20)-quantized vectors
    // make every projection SIGN — hence signatures, buckets, the
    // maxBucket-capped + successor-chained candidate join — exact
    // integer arithmetic both engines replay bit-identically; the
    // verify cosine runs on the ORIGINAL double vectors
    // (list_cosine_similarity, the q32/q34 precedent). Planted
    // near-dups perturb by replayable md5 noise (±1e-3). Production
    // config keeps the MurmurHash planes (q360's planted gate); THIS
    // query gates the banded pipeline STRUCTURE cross-engine.
    Q("q47_embedding_neardup_lsh", {
      def dec(hx: String) = (1 to 15).map(i =>
        s"(strpos('0123456789abcdef', substr($hx, $i, 1)) - 1) * " +
          s"${BigInt(16).pow(15 - i)}").mkString("(", " + ", ")")
      val pvHx = "substr(md5('pv' || vec_id || '|' || (i - 1)), 1, 15)"
      // every geometry literal below derives from the SAME constants the
      // Spark call's defaults use (Similarity.EmbLshDefaults) — a default
      // change on either side now breaks loudly, never silently
      val L = Similarity.EmbLshDefaults
      Some("WITH b0 AS (SELECT vec_id, " +
        s"${dvecSql.format("embedding")} AS v FROM embeddings), " +
        "pert AS (SELECT vec_id + 1000000 AS vec_id, " +
        s"list_transform(v, (x, i) -> x + ((${dec(pvHx)} % 1000) - 500) " +
        "/ 500000.0) AS v FROM b0), " +
        "corpus AS (SELECT vec_id, v FROM b0 " +
        "UNION ALL SELECT vec_id, v FROM pert), " +
        "reps AS (SELECT v, min(vec_id) AS rid FROM corpus GROUP BY v), " +
        "pl0 AS (SELECT t.range AS t, p.range AS p, d.range AS d, " +
        s"substr(md5('hp${L.Seed}|' || t.range || '|' || p.range || '|' || " +
        "d.range), 1, 15) AS hx " +
        s"FROM range(${L.NTables}) t, range(${L.NPlanes}) p, range(64) d), " +
        s"pl AS (SELECT t, p, d, (${dec("hx")} % ${L.CoefMod}) - " +
        s"${L.CoefShift} AS c FROM pl0), " +
        "dims AS (SELECT rid, unnest(v) AS x, unnest(range(64)) AS d " +
        "FROM reps), " +
        s"qz AS (SELECT rid, d, CAST(floor(x * ${L.QuantGrid}.0) AS BIGINT) " +
        "AS qd FROM dims), " +
        "dots AS (SELECT qz.rid, pl.t, pl.p, sum(pl.c * qz.qd) AS dot " +
        "FROM qz JOIN pl ON qz.d = pl.d GROUP BY 1, 2, 3), " +
        "sigs AS (SELECT rid, t, sum(CASE WHEN dot >= 0 THEN " +
        "(CAST(1 AS BIGINT) << p) ELSE 0 END) AS sig FROM dots " +
        "GROUP BY 1, 2), " +
        "rk AS (SELECT rid, t, sig, row_number() OVER (PARTITION BY " +
        "t, sig ORDER BY rid) AS rn FROM sigs), " +
        "cand AS (SELECT DISTINCT a.rid AS ra, b.rid AS rb " +
        "FROM rk a JOIN rk b ON a.t = b.t AND a.sig = b.sig AND " +
        s"((a.rn < b.rn AND b.rn <= ${L.MaxBucket}) OR b.rn = a.rn + 1)), " +
        "ver AS (SELECT x.v AS va, y.v AS vb, " +
        "list_cosine_similarity(x.v, y.v) AS cos " +
        "FROM cand JOIN reps x ON x.rid = cand.ra " +
        "JOIN reps y ON y.rid = cand.rb " +
        "WHERE list_cosine_similarity(x.v, y.v) >= 0.9), " +
        "expd AS (SELECT least(xa.vec_id, xb.vec_id) AS id_a, " +
        "greatest(xa.vec_id, xb.vec_id) AS id_b, cos " +
        "FROM ver JOIN corpus xa ON xa.v = ver.va " +
        "JOIN corpus xb ON xb.v = ver.vb), " +
        "wi AS (SELECT x.vec_id AS id_a, y.vec_id AS id_b, " +
        "list_cosine_similarity(x.v, y.v) AS cos " +
        "FROM corpus x JOIN corpus y ON x.v = y.v " +
        "AND x.vec_id < y.vec_id " +
        "WHERE list_cosine_similarity(x.v, y.v) >= 0.9) " +
        "SELECT id_a, id_b, round(cos, 6) AS cos FROM " +
        "(SELECT * FROM expd UNION ALL SELECT * FROM wi) " +
        "ORDER BY id_a, id_b")
    },
      (s, dir) => {
        import graft.pipeline.Dedup
        val emb = Tables.embeddings(s, dir)
          .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("embedding"))
        // the noise salt keys on the ORIGINAL id: rename it first —
        // inside this projection a bare col("vec_id") would lateral-
        // resolve to the freshly aliased (vec_id + 1e6) column
        val planted = emb
          .select(col("vec_id").as("__src"), col("embedding"))
          .select((col("__src") + 1000000L).as("vec_id"),
            transform(col("embedding"), (x, i) =>
              x + ((Dedup.md5h60(concat(lit("pv"), col("__src").cast("string"),
                  lit("|"), i.cast("string"))) % 1000L) - 500L) / lit(500000.0))
              .as("embedding"))
        Similarity.embeddingNearDupPairs(emb.union(planted), 0.9, dim = 64,
            md5Seeded = true)
          .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
          .orderBy("id_a", "id_b")
      }),

    // ---- brute-force cosine top-k for a query set (vec_id < 10): ranks are
    // float-order-robust (random vectors; no near-ties), ids are exact.
    Q("q33_ann_bruteforce",
      // CAST rank to INTEGER: DuckDB row_number() is BIGINT, Spark's int —
      // the driver hash is dtype-sensitive
      Some("WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 10) " +
        "SELECT qid, nn_id, CAST(rank AS INTEGER) AS rank FROM (" +
        "SELECT q.qid, e.vec_id AS nn_id, " +
        s"row_number() OVER (PARTITION BY q.qid ORDER BY list_cosine_similarity(${dvecSql.format("e.embedding")}, ${dvecSql.format("q.qvec")}) DESC, e.vec_id) AS rank " +
        "FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid) " +
        "WHERE rank <= 5 ORDER BY qid, rank"),
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val queries = emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        Similarity.bruteForceTopK(emb, queries, k = 5)
          .select(col("qid"), col("nn_id"), col("rank"))
          .orderBy("qid", "rank")
      }),

    // ---- ANN via random-hyperplane LSH with query-directed multiprobe,
    // proven against PLANTED ground truth (the q70 discipline brought to
    // vectors): each query vector re-enters the corpus verbatim at
    // id+10^6, so its LSH signature is bit-identical to the query's in
    // every table — the banded pipeline MUST surface it as a candidate,
    // the exact-cosine verify scores it 1.0 (dot(v,v)/√(dot·dot) is
    // exactly 1.0 in IEEE), and it lands in the top-k. The gated report
    // is recall-on-planted = found TRUE for every query plus the planted
    // pair's 6dp cosine; the oracle states the ground truth in closed
    // form. (Raw top-k lists stay engine-specific — recall ≥ 0.8 vs brute
    // force remains spec-asserted in PipelineSpec.)
    Q("q34_ann_lsh",
      Some("SELECT vec_id AS qid, vec_id + 1000000 AS planted_id, " +
        "TRUE AS found, 1.0 AS planted_cos FROM embeddings " +
        "WHERE vec_id < 10 ORDER BY qid"),
      (s, dir) => {
        val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
        val queries = emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val corpus = emb.unionByName(queries.select(
          (col("qid") + lit(1000000L)).as("vec_id"),
          col("qvec").as("embedding")))
        val top = Similarity.annTopK(corpus, queries, k = 5, dim = 64)
        queries.select(col("qid"), (col("qid") + lit(1000000L)).as("planted_id"))
          .join(top.filter(col("nn_id") === col("qid") + lit(1000000L))
              .select(col("qid"), lit(true).as("found"),
                round(col("cos"), 6).as("planted_cos")),
            Seq("qid"), "left")
          .select(col("qid"), col("planted_id"),
            coalesce(col("found"), lit(false)).as("found"),
            col("planted_cos"))
          .orderBy("qid")
      }),

    // ---- IVF-style assignment with deterministic pseudo-random centroids:
    // pure arithmetic on both sides, so the 16 centroid vectors (and their
    // norms, exactly as Spark's plan embeds them) ship INTO the oracle SQL
    // as a VALUES list — the argmax (cos DESC, cid ASC tie-break) is
    // mirrored with a row_number over the same formula. The k-means variant
    // stays exercised by q50 and the PipelineSpec recall comparison.
    Q("q35_ivf_assign",
      Some {
        val cents = Similarity.pseudoCentroids(16, 64)
        val values = cents.map { case (cid, v) =>
          s"($cid, [${v.mkString(", ")}], ${math.sqrt(v.map(x => x * x).sum)})"
        }.mkString(", ")
        val ed = dvecSql.format("e.embedding")
        s"WITH c(cid, cv, cnorm) AS (VALUES $values), " +
          "a AS (SELECT e.vec_id, c.cid, row_number() OVER (PARTITION BY e.vec_id " +
          s"ORDER BY -list_dot_product($ed, c.cv) / (sqrt(list_dot_product($ed, $ed)) * c.cnorm) ASC, c.cid ASC) AS rn " +
          "FROM embeddings e CROSS JOIN c) " +
          "SELECT cid AS centroid, count(*) AS n_vectors FROM a WHERE rn = 1 " +
          "GROUP BY cid ORDER BY cid"
      },
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        Similarity.ivfAssign(emb, Similarity.pseudoCentroids(16, 64))
          .groupBy("centroid").agg(count(lit(1)).as("n_vectors"))
          .orderBy("centroid")
      }),

    // ---- IVF probe search proven against PLANTED ground truth (q34's
    // sibling): the verbatim copy at id+10^6 is assigned to the centroid
    // that maximizes ITS cosine — which, probing under the same matched
    // metric (ivfTopK's probe order IS the assignment score), is exactly
    // the query's probe #1 — so the copy is structurally inside the
    // probed partitions, exact-reranks at cosine 1.0, and must appear in
    // the top-k. found TRUE for every query is the recall-on-planted
    // gate; probe-all ≡ brute force and partial-probe recall stay
    // spec-asserted in PipelineSpec.
    Q("q50_ivf_search",
      Some("SELECT vec_id AS qid, vec_id + 1000000 AS planted_id, " +
        "TRUE AS found, 1.0 AS planted_cos FROM embeddings " +
        "WHERE vec_id < 10 ORDER BY qid"),
      (s, dir) => {
        val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
        val queries = emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val corpus = emb.unionByName(queries.select(
          (col("qid") + lit(1000000L)).as("vec_id"),
          col("qvec").as("embedding")))
        val centroids = Similarity.kmeansCentroids(emb, nCentroids = 16)
        val top = Similarity.ivfTopK(corpus, queries, centroids, k = 5,
          nProbe = 4)
        queries.select(col("qid"), (col("qid") + lit(1000000L)).as("planted_id"))
          .join(top.filter(col("nn_id") === col("qid") + lit(1000000L))
              .select(col("qid"), lit(true).as("found"),
                round(col("cos"), 6).as("planted_cos")),
            Seq("qid"), "left")
          .select(col("qid"), col("planted_id"),
            coalesce(col("found"), lit(false)).as("found"),
            col("planted_cos"))
          .orderBy("qid")
      }),

    // ---- multimodal decode, oracle-checked: every fixture payload embeds
    // metadata that is a pure function of doc_id (PNG dims, WAV rate/
    // channels/duration, MP4 mvhd/tkhd, MJPEG-AVI avih), so the REAL codec
    // decode on the Spark side must recover exactly what the SQL side
    // recomputes from doc_id arithmetic — a genuine end-to-end check of the
    // binary parsers without DuckDB decoding a byte. (sizeBytes/features
    // stay out: they depend on deflate/JPEG encode output.) The fixture
    // media table is rendered ONCE per sf dir to a temp parquet
    // (MediaFixtures), so the measured query times DECODE, not synthesis.
    Q("q36_multimodal_decode",
      Some("SELECT doc_id, " +
        "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind, " +
        "CASE doc_id % 3 WHEN 0 THEN 4 + doc_id % 13 WHEN 1 THEN 0 " +
        "ELSE CASE WHEN (doc_id // 3) % 2 = 0 THEN 160 + (doc_id % 5) * 80 ELSE 8 + (doc_id % 5) * 3 END END AS w, " +
        "CASE doc_id % 3 WHEN 0 THEN 4 + doc_id % 7 WHEN 1 THEN 0 " +
        "ELSE CASE WHEN (doc_id // 3) % 2 = 0 THEN 120 + (doc_id % 3) * 60 ELSE 8 + (doc_id % 3) * 5 END END AS h, " +
        "CASE doc_id % 3 WHEN 0 THEN 0 WHEN 1 THEN (160 + (doc_id % 7) * 80) // 8 " +
        "ELSE CASE WHEN (doc_id // 3) % 2 = 0 THEN 500 + (doc_id % 11) * 250 ELSE (2 + doc_id % 3) * 40 END END AS duration_ms, " +
        "CAST(CASE doc_id % 3 WHEN 1 THEN 8000 ELSE 0 END AS BIGINT) AS sample_rate, " +
        "CAST(CASE doc_id % 3 WHEN 1 THEN 1 ELSE 0 END AS BIGINT) AS channels, " +
        "CAST(16 AS BIGINT) AS n_features " +
        "FROM documents ORDER BY doc_id"),
      (s, dir) => {
        val media = MediaFixtures.materializedMediaTable(s, dir)
        Multimodal.decode(media)
          .select(col("mediaId").as("doc_id"),
            col("meta.kind").as("kind"),
            col("meta.width").cast("long").as("w"),
            col("meta.height").cast("long").as("h"),
            col("meta.durationMs").as("duration_ms"),
            col("meta.sampleRateHz").cast("long").as("sample_rate"),
            col("meta.channels").cast("long").as("channels"),
            size(col("features")).cast("long").as("n_features"))
          .orderBy("doc_id")
      })
,

    // ---- resize stage between decode and feature-extract: real JDK
    // bilinear rescale + PNG re-encode for every decodable image;
    // audio/video pass through untouched. The re-decode must report the
    // TARGET dims for images (proof the resize actually transformed the
    // pixels and re-encoded a valid PNG) and the original container
    // metadata for everything else — same q36 discipline, doc_id
    // arithmetic only, DuckDB never touches a byte.
    Q("q220_resize",
      Some("SELECT doc_id, " +
        "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind, " +
        "CASE doc_id % 3 WHEN 0 THEN 16 WHEN 1 THEN 0 " +
        "ELSE CASE WHEN (doc_id // 3) % 2 = 0 THEN 160 + (doc_id % 5) * 80 ELSE 8 + (doc_id % 5) * 3 END END AS w, " +
        "CASE doc_id % 3 WHEN 0 THEN 12 WHEN 1 THEN 0 " +
        "ELSE CASE WHEN (doc_id // 3) % 2 = 0 THEN 120 + (doc_id % 3) * 60 ELSE 8 + (doc_id % 3) * 5 END END AS h, " +
        "doc_id % 3 = 0 AS resized " +
        "FROM documents ORDER BY doc_id"),
      (s, dir) => {
        val media = MediaFixtures.materializedMediaTable(s, dir)
        val resized = Multimodal.resizeImages(media, targetW = 16, targetH = 12)
        Multimodal.decode(resized)
          .join(resized.select(col("media_id"), col("resized")),
            col("mediaId") === col("media_id"))
          .select(col("mediaId").as("doc_id"),
            col("meta.kind").as("kind"),
            col("meta.width").cast("long").as("w"),
            col("meta.height").cast("long").as("h"),
            col("resized"))
          .orderBy("doc_id")
      }),

    // ---- contrastive triplet mining: positives = within-cell near-dup
    // pairs (q216's relation, anchor = smaller id); the negative is the
    // hash-chosen OTHER cell's min-id vector - a broadcast join against
    // the 8-row cell-minimum relation, deterministic in both engines.
    Q("q226_triplets", {
      val cents = Similarity.pseudoCentroids(8, 64)
      val values = cents.map { case (cid, v) =>
        s"($cid, [${v.mkString(", ")}], ${math.sqrt(v.map(x => x * x).sum)})"
      }.mkString(", ")
      val ed = dvecSql.format("e.embedding")
      Some(s"WITH c(cid, cv, cnorm) AS (VALUES $values), " +
        s"a AS (SELECT e.vec_id, $ed AS v, c.cid, row_number() OVER (PARTITION BY e.vec_id " +
        s"ORDER BY -list_dot_product($ed, c.cv) / (sqrt(list_dot_product($ed, $ed)) * c.cnorm) ASC, c.cid ASC) AS rn " +
        "FROM embeddings e CROSS JOIN c), " +
        "asg AS (SELECT vec_id, v, cid FROM a WHERE rn = 1), " +
        "cm AS (SELECT cid, min(vec_id) AS negative FROM asg GROUP BY cid), " +
        "p AS (SELECT x.vec_id AS anchor, y.vec_id AS positive, x.cid, " +
        "round(list_cosine_similarity(x.v, y.v), 6) AS cos_ap " +
        "FROM asg x JOIN asg y ON x.cid = y.cid AND x.vec_id < y.vec_id " +
        "AND list_cosine_similarity(x.v, y.v) >= 0.35), " +
        "d AS (SELECT anchor, positive, cos_ap, " +
        "(cid + 1 + (('0x' || substring(md5('trip' || CAST(anchor AS VARCHAR)), 1, 8))::BIGINT % 7)) % 8 AS nc FROM p) " +
        "SELECT d.anchor, d.positive, cm.negative, d.cos_ap " +
        "FROM d LEFT JOIN cm ON cm.cid = d.nc ORDER BY anchor, positive")
    },
      (s, dir) => Similarity.mineTriplets(Tables.embeddings(s, dir),
          Similarity.pseudoCentroids(8, 64), threshold = 0.35)
        .orderBy("anchor", "positive")),

    // ---- SemDeDup-style semantic dedup: k-means-cell partition (8
    // deterministic pseudo-random centroids shipped into the oracle as a
    // VALUES list, q35 discipline), pairwise cosine only WITHIN a cell,
    // larger id of any pair at cos >= 0.35 drops - one representative per
    // semantic ball. Cross-cell misses are the method's documented
    // approximation; the within-cell pair relation is the only quadratic
    // term and cell count scales with the corpus.
    Q("q216_semdedup", {
      val cents = Similarity.pseudoCentroids(8, 64)
      val values = cents.map { case (cid, v) =>
        s"($cid, [${v.mkString(", ")}], ${math.sqrt(v.map(x => x * x).sum)})"
      }.mkString(", ")
      val ed = dvecSql.format("e.embedding")
      Some(s"WITH c(cid, cv, cnorm) AS (VALUES $values), " +
        s"a AS (SELECT e.vec_id, $ed AS v, c.cid, row_number() OVER (PARTITION BY e.vec_id " +
        s"ORDER BY -list_dot_product($ed, c.cv) / (sqrt(list_dot_product($ed, $ed)) * c.cnorm) ASC, c.cid ASC) AS rn " +
        "FROM embeddings e CROSS JOIN c), " +
        "asg AS (SELECT vec_id, v, cid FROM a WHERE rn = 1), " +
        "dr AS (SELECT DISTINCT x.vec_id FROM asg x JOIN asg y " +
        "ON x.cid = y.cid AND y.vec_id < x.vec_id " +
        "AND list_cosine_similarity(x.v, y.v) >= 0.35) " +
        "SELECT vec_id, cid AS centroid FROM asg " +
        "WHERE vec_id NOT IN (SELECT vec_id FROM dr) ORDER BY vec_id")
    },
      (s, dir) => Similarity.semanticDedup(Tables.embeddings(s, dir),
          Similarity.pseudoCentroids(8, 64), threshold = 0.35)
        .orderBy("vec_id"))
  ,

    // ---- top principal direction by power iteration (3 unrolled rounds):
    // the Gram matrix never materializes — each round is two co-keyed
    // aggregates with DECIMAL(28,12) product terms and a 12dp re-quantized
    // unit vector, so the loading vector is bit-identical cross-engine.
    // Oracle = the identical rounds as generated CTEs (the q136 pattern).
    Q("q243_pca_power", {
      val rounds = (1 to 3).map { i =>
        val prev = if (i == 1) "v0" else s"v${i - 1}"
        s"s$i AS (SELECT x.vec_id, CAST(SUM(CAST(x.x * p.v AS DECIMAL(28,12))) " +
          s"AS DOUBLE) AS s FROM x JOIN $prev p ON x.dim = p.dim GROUP BY 1), " +
          s"t$i AS (SELECT x.dim, CAST(SUM(CAST(x.x * q.s AS DECIMAL(28,12))) " +
          s"AS DOUBLE) AS t FROM x JOIN s$i q ON x.vec_id = q.vec_id GROUP BY 1), " +
          s"n$i AS (SELECT sqrt(CAST(SUM(CAST(t * t AS DECIMAL(38,12))) " +
          s"AS DOUBLE)) AS n FROM t$i), " +
          s"v$i AS (SELECT dim, round(t / n, 12) AS v FROM t$i, n$i)"
      }.mkString(", ")
      Some("WITH x AS (SELECT vec_id, unnest(range(1, len(embedding) + 1)) AS dim, " +
        "CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings), " +
        "v0 AS (SELECT DISTINCT dim, CAST(1.0 AS DOUBLE) AS v FROM x), " +
        rounds + " " +
        // CAST dim to INTEGER: Spark posexplode ordinal is int
        "SELECT CAST(dim AS INTEGER) AS dim, round(v, 6) AS loading FROM v3 ORDER BY dim")
    },
      (s, dir) => Similarity.topPrincipalComponent(
        Tables.embeddings(s, dir), "vec_id", "embedding", iters = 3)
        .orderBy("dim"))
  ,

    // ---- centroid-silhouette per label: a = own-centroid distance,
    // b = nearest-other-centroid distance, mean (b-a)/max(a,b) — the
    // embedding cluster-quality report; decimal-exact centroids and
    // distance sums, s-terms DECIMAL(28,12) before the label mean.
    Q("q256_centroid_separation",
      Some("WITH x AS (SELECT vec_id, label, " +
        "unnest(range(1, len(embedding) + 1)) AS i, " +
        "CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings), " +
        "c AS (SELECT label AS cl, i, " +
        "CAST(SUM(CAST(v AS DECIMAL(38,12))) AS DOUBLE) / " +
        "CAST(count(*) AS DOUBLE) AS c FROM x GROUP BY 1, 2), " +
        "d AS (SELECT x.vec_id, x.label, c.cl, " +
        "sqrt(CAST(SUM(CAST((x.v - c.c) * (x.v - c.c) AS DECIMAL(28,12))) " +
        "AS DOUBLE)) AS dist FROM x JOIN c ON x.i = c.i GROUP BY 1, 2, 3), " +
        "a AS (SELECT vec_id, label, dist AS ad FROM d WHERE label = cl), " +
        "b AS (SELECT vec_id, min(dist) AS bd FROM d WHERE label <> cl GROUP BY 1), " +
        "s AS (SELECT a.label, CAST(CASE WHEN greatest(ad, bd) > 0.0 " +
        "THEN (bd - ad) / greatest(ad, bd) ELSE 0.0 END AS DECIMAL(28,12)) AS s " +
        "FROM a JOIN b USING (vec_id)) " +
        "SELECT label, count(*) AS n, " +
        "round(CAST(sum(s) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) " +
        "AS separation FROM s GROUP BY 1 ORDER BY label"),
      (s, dir) => Similarity.centroidSeparation(
        Tables.embeddings(s, dir), "vec_id", "label", "embedding")
        .orderBy("label"))
  )
}

/** Second similarity/multimodal wave (split keeps per-file JVM method size
  * in check). */
object SimilarityQueries2 {

  val qs: Seq[Q] = Seq(

    // ---- REAL video frame sampling: every 2nd MJPEG-AVI frame, demuxed
    // from the RIFF stream chunks and JPEG-decoded in-partition; the oracle
    // replays the fixture's id-arithmetic (frame count, 25 fps clock,
    // dimensions), so the container parse + frame decode are checked
    // against pure SQL. BMFF fixtures carry no in-band frame index and
    // yield no rows (documented operator contract).
    Q("q265_frame_sample",
      Some("WITH v AS (SELECT doc_id FROM documents " +
        "WHERE doc_id % 3 = 2 AND (doc_id // 3) % 2 = 1), " +
        "f AS (SELECT doc_id, unnest(range(0, 2 + doc_id % 3, 2)) AS frame_idx " +
        "FROM v) " +
        // CASTs to INTEGER: Spark emits int frame ordinals and dimensions
        "SELECT doc_id AS media_id, CAST(frame_idx AS INTEGER) AS frame_idx, frame_idx * 40000 AS pts_us, " +
        "CAST(8 + (doc_id % 5) * 3 AS INTEGER) AS w, CAST(8 + (doc_id % 3) * 5 AS INTEGER) AS h " +
        "FROM f ORDER BY media_id, frame_idx"),
      (s, dir) => Multimodal.extractFrames(
          MediaFixtures.materializedMediaTable(s, dir), step = 2)
        .select("media_id", "frame_idx", "pts_us", "w", "h")
        .orderBy("media_id", "frame_idx")),

    // ---- embedding near-dup LSH proven on PLANTED exact duplicates
    // (q359's vector sibling): every 5th vector re-enters verbatim at
    // id+10⁶ — identical bytes → identical md5 fingerprint → the pair
    // comes from the same-fingerprint expansion branch (cosine exactly
    // 1.0 after the 6dp round), which collapses BEFORE banding and is
    // immune to the bucket skew cap. (Since round 13, q47 is ALSO fully
    // oracle-checked via the md5-seeded integer-plane replay; this query
    // keeps the verbatim-duplicate branch pinned under the PRODUCTION
    // MurmurHash plane config.)
    Q("q360_embedding_dedup_planted",
      Some("SELECT vec_id AS id, vec_id + 1000000 AS planted_id, " +
        "TRUE AS found, 1.0 AS cos FROM embeddings " +
        "WHERE vec_id % 5 = 0 ORDER BY id"),
      (s, dir) => {
        val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
        val planted = emb.filter(pmod(col("vec_id"), lit(5L)) === 0)
          .select((col("vec_id") + lit(1000000L)).as("vec_id"),
            col("embedding"))
        val pairs = Similarity.embeddingNearDupPairs(
          emb.unionByName(planted), 0.999, dim = 64)
        emb.filter(pmod(col("vec_id"), lit(5L)) === 0)
          .select(col("vec_id").as("id"))
          .join(pairs.filter(col("id_b") === col("id_a") + lit(1000000L))
              .select(col("id_a").as("id"), lit(true).as("found"),
                round(col("cos"), 6).as("cos")),
            Seq("id"), "left")
          .select(col("id"), (col("id") + lit(1000000L)).as("planted_id"),
            coalesce(col("found"), lit(false)).as("found"), col("cos"))
          .orderBy("id")
      })
  )
}
