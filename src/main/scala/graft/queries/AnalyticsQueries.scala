package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.{Sketches, TextFunctions, TfIdf}
import graft.model.Tables

/** Corpus-profiling analytics: distinct-count sketches (KMV, HLL bucket
  * build), PII redaction, n-gram frequency, character entropy, and a
  * moment-based dispersion/correlation battery. Every query has an exact
  * DuckDB oracle; the sketches use the md5 hash family the oracle
  * replays, and the stats battery derives stddev/corr from EXACT decimal
  * moment sums (rounded once at scale 6) so the final double formula is
  * bit-identical across engines — never the engines' own streaming
  * stddev/corr aggregates, whose merge order is engine-specific.
  */
object AnalyticsQueries extends graft.QueryModule {

  // Look patterns up by tag, not position — the pattern list is ordered
  // for scrub precedence and positions shift as patterns are added.
  private def piiRe(tag: String): String =
    TextFunctions.PiiPatterns.find(_._2 == tag).get._1
  private val emailRe = piiRe("<EMAIL>")
  private val urlRe = piiRe("<URL>")
  private val ssnRe = piiRe("<SSN>")
  private val phoneRe = piiRe("<PHONE>")
  private val numRe = piiRe("<NUM>")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // KMV distinct sketch: k smallest hash values per group via the
    // native TopKPerKey operator (bounded heaps, no full sort), integer
    // estimate arithmetic. Estimates ~60k distinct keys per flag from a
    // 256-value sketch.
    "sketch_kmv_distinct" -> { (s, dir) =>
      import s.implicits._
      Sketches.kmvDistinct(Tables.lineitem(s, dir), $"l_returnflag",
          $"l_orderkey")
        .withColumnRenamed("group", "l_returnflag")
        .orderBy($"l_returnflag")
    },

    // KMV set operations: pairwise distinct-content overlap between
    // sources from per-source sketches (k=16 so large sources actually
    // exercise the estimator while small ones stay exact). The corpus is
    // reduced once to |sources| sketch rows; pairs never touch raw data.
    "sketch_kmv_overlap" -> { (s, dir) =>
      import s.implicits._
      val sk = Sketches.kmvSketch(Tables.documents(s, dir), $"source",
        graft.functions.TextFunctions.fingerprint($"text"), k = 16,
        salt = "kmvo")
      Sketches.kmvPairOverlap(sk, k = 16)
        .withColumnRenamed("group_a", "source_a")
        .withColumnRenamed("group_b", "source_b")
        .orderBy($"source_a", $"source_b")
    },

    // HLL sketch build: 64-bucket max-leading-zero table per group — ONE
    // partial-aggregable groupBy; buckets merge by max across shards.
    // (The float estimate fold is hllEstimate, pinned by tolerance spec.)
    "sketch_hll_buckets" -> { (s, dir) =>
      import s.implicits._
      Sketches.hllBuckets(Tables.lineitem(s, dir), $"l_returnflag",
          $"l_orderkey")
        .withColumnRenamed("group", "l_returnflag")
        .orderBy($"l_returnflag", $"bucket")
    },

    // Per-doc top-3 TF-IDF terms: tf and df are exact-integer aggregates,
    // idf the one libm step (ln, rounded to 4 decimals — the proven
    // oracle-safe form); top-k rides the native TopK bounded heaps with
    // a total (score desc, token) order.
    "text_tfidf_top" -> { (s, dir) =>
      import s.implicits._
      TfIdf.topTerms(Tables.documents(s, dir), "text", "doc_id", 3)
        .orderBy($"doc_id", $"score".desc, $"token")
    },

    // BM25 ranked retrieval (RAG retrieval leg): 5 corpus-derived queries
    // (first 6 tokens of docs 0-4) against the whole corpus, top-10 each
    // on the native bounded-heap TopK. One corpus exchange builds
    // (doc, token, tf, dl); query terms + df + constants ride one
    // broadcast; per-term scores decimal-summed (order-independent).
    "text_bm25_topk" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val toks = filter(
        graft.functions.TextFunctions.tokens($"text"), t => t =!= "")
      val q = docs.filter($"doc_id" < 5)
        .select($"doc_id".as("query_id"),
          array_join(slice(toks, 1, 6), " ").as("qtext"))
      graft.functions.Bm25.topK(docs, "text", "doc_id",
        q, "qtext", "query_id", k = 10)
        .orderBy($"query_id", $"score".desc, $"doc_id")
    },

    // Count-min frequency sketch: 4x1024 exact-integer cell matrix over
    // lineitem supplier keys (one partial-aggregable groupBy, bounded
    // state), probed for 20 supplier counts — est = min over rows,
    // never below the true count. Linear sketch: shards merge by cell
    // sum (spec-tested).
    "sketch_cms_probe" -> { (s, dir) =>
      import s.implicits._
      val sk = Sketches.countMin(Tables.lineitem(s, dir), $"l_suppkey")
      val probes = s.range(1, 21).select($"id".as("key"))
      Sketches.cmsLookup(sk, probes)
        .withColumnRenamed("key", "l_suppkey")
        .orderBy($"l_suppkey")
    },

    // Bloom filter: 8192-bit, 3-hash filter over order customer keys,
    // probed with 10 present + 10 absent keys. No false negatives by
    // construction; the (deterministic) false-positive pattern of the
    // absent keys is replayed exactly by the oracle.
    "sketch_bloom_member" -> { (s, dir) =>
      import s.implicits._
      val filt = Sketches.bloomBuild(Tables.orders(s, dir), $"o_custkey")
      val probes = s.range(1, 11).union(s.range(9000001L, 9000011L))
        .select($"id".as("key"))
      Sketches.bloomContains(filt, probes).orderBy($"key")
    },

    // Hash-sampled quantile sketch: bottom-1024-by-hash uniform sample
    // per return flag (bounded TopK heaps — k·|groups| rows shuffled,
    // never the table), then exact lower-nearest-rank order statistics
    // within the sample. Partitioning-invariant by construction (the k
    // smallest hashes win under any layout), unlike merge-order-
    // dependent GK/KLL state.
    "sketch_quantiles" -> { (s, dir) =>
      import s.implicits._
      Sketches.hashQuantiles(Tables.lineitem(s, dir), $"l_returnflag",
          concat($"l_orderkey", lit("_"), $"l_linenumber"),
          $"l_extendedprice", Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99))
        .withColumnRenamed("group", "l_returnflag")
        .orderBy($"l_returnflag", $"q")
    },

    // PII redaction + audit counts. The fixture corpus is synthetic word
    // soup with no PII, so the query plants a deterministic email/URL/
    // phone/SSN/digit-run per row (a pure function of doc_id, mirrored
    // by the oracle) and then scrubs it — every pattern is genuinely
    // exercised, including the separator-formatted phone and SSN forms.
    "text_scrub_pii" -> { (s, dir) =>
      import s.implicits._
      val planted = concat($"text", lit(" contact user"),
        $"doc_id".cast("string"),
        lit("@mail.example.com or https://ex.org/d/"),
        $"doc_id".cast("string"), lit(" tel ("),
        lpad(($"doc_id" % 1000).cast("string"), 3, "0"),
        lit(") 555-0199 ssn 078-05-1120 ref "),
        ($"doc_id" * $"doc_id" + 123456L).cast("string"), lit("."))
      Tables.documents(s, dir)
        .select($"doc_id", planted.as("__txt"))
        // Regex columns ABOVE the output sort: the range partitioner's
        // sampling pass re-executes the sort's child, so the six regex
        // evaluations would otherwise run twice per row.
        .orderBy($"doc_id")
        .select($"doc_id",
          TextFunctions.countMatches($"__txt", emailRe).as("n_emails"),
          TextFunctions.countMatches($"__txt", urlRe).as("n_urls"),
          TextFunctions.countMatches($"__txt", ssnRe).as("n_ssns"),
          TextFunctions.countMatches($"__txt", phoneRe).as("n_phones"),
          TextFunctions.countMatches($"__txt", numRe).as("n_nums"),
          TextFunctions.scrubPii($"__txt").as("scrubbed"))
    },

    // Per-domain crawl profiling: extract every URL (the PiiPatterns
    // <URL> regex, so extraction and redaction agree), take its host,
    // and aggregate URL/document counts per host — the source-
    // distribution pass a web-corpus pipeline runs before per-domain
    // filtering/reweighting. The fixture corpus carries no URLs, so
    // each row plants two (a pure function of doc_id, mirrored by the
    // oracle). Pure projection + explode + one aggregate shuffle.
    "text_url_domains" -> { (s, dir) =>
      import s.implicits._
      val planted = concat($"text",
        lit(" see https://sub"), ($"doc_id" % 7).cast("string"),
        lit(".site"), ($"doc_id" % 13).cast("string"),
        lit(".example.com/page/"), $"doc_id".cast("string"),
        lit(" and http://news"), ($"doc_id" % 5).cast("string"),
        lit(".example.org/a?id="), $"doc_id".cast("string"))
      Tables.documents(s, dir)
        .select($"doc_id", planted.as("__t"))
        .select($"doc_id", explode(TextFunctions.urls($"__t")).as("url"))
        .select($"doc_id", TextFunctions.urlHost($"url").as("host"))
        .groupBy($"host")
        .agg(count(lit(1)).as("n_urls"),
          countDistinct($"doc_id").as("n_docs"))
        .orderBy($"host")
    },

    // HTML markup stripping (the crawl-extraction first pass). The
    // fixture corpus is plain text, so each row is wrapped in
    // deterministic markup (a pure function of doc_id, mirrored by the
    // oracle) and then stripped — tags of varying shape (attributes,
    // self-closing, nested) are all genuinely exercised.
    "text_strip_html" -> { (s, dir) =>
      import s.implicits._
      val marked = concat(lit("<div class=\"doc-"), $"doc_id".cast("string"),
        lit("\"><h1>t</h1><p>"), $"text", lit("</p><br/></div>"))
      Tables.documents(s, dir)
        .select($"doc_id", marked.as("__html"))
        .orderBy($"doc_id")
        .select($"doc_id",
          length($"__html").as("n_raw"),
          TextFunctions.stripHtml($"__html").as("cleaned"))
    },

    // Corpus-level bigram frequency top-20 (count desc, bigram asc —
    // fully deterministic). Shuffle = one partial-aggregated groupBy on
    // the bigram, then a 20-row limit.
    "text_top_bigrams" -> { (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir)
        .select(TextFunctions.tokens($"text").as("__toks"))
        .select(explode(TextFunctions.bigramsFromTokens($"__toks")).as("bigram"))
        .groupBy($"bigram").agg(count(lit(1)).as("n_occurrences"))
        .orderBy($"n_occurrences".desc, $"bigram")
        .limit(20)
    },

    // Character-entropy quality signal, rounded to 4 decimals (the only
    // libm use in the oracle surface; the round absorbs sub-ulp
    // summation-order and libm differences). Computed as explode →
    // per-(doc, char) counts → per-doc fold: linear work and partial-
    // aggregable, where the per-row array-lambda form
    // (TextFunctions.charEntropy, kept for inline filter use) is
    // O(distinct·len) per document — measured 4× slower at sf0.1.
    "text_char_entropy" -> { (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir)
        .select($"doc_id", length($"text").as("n"),
          explode(split($"text", "")).as("ch"))
        .groupBy($"doc_id", $"n", $"ch").agg(count(lit(1)).as("cnt"))
        .groupBy($"doc_id", $"n")
        // Each term rounds its one libm call (log2) at 8, then the
        // cnt-weighted product again at 8 before the DECIMAL cast, so
        // the sum is order-free AND ulp-divergence-free across engines
        // (the langid `round(cnt * logp, 8)` pattern; the unrounded
        // double sum here was the same latent class as the
        // docs_*_logprob sf0.1 miss, r8).
        // (9,0)×(18,8) exact-decimal product of the integer count and
        // the 8-dp-rounded log2 — a double product near a rounding
        // boundary is the docs_unigram_logprob divergence class.
        .agg(sum($"cnt".cast(DecimalType(9, 0)) *
            round(log2($"cnt".cast("double")), 8).cast(DecimalType(18, 8)))
          .as("__s"))
        // entropy = round(log2r8(n) − S/n, 4) = round((a·n − S)/n, 4)
        // with a = log2r8(n) exact at 8 dp — evaluated tie-free by the
        // exact-integer mean (see docs_unigram_logprob). __s is cast
        // DOWN to (28,8) first: (28,8) − sum-widened (38,8) has ideal
        // precision 39 > 38 and Spark's clamp would silently round the
        // difference at scale 7, breaking the helper's exact-8-dp
        // contract; (28,8) − (28,8) → (29,8) stays exact.
        .select($"doc_id",
          Parity.exactMeanRound4(
            round(log2($"n".cast("double")), 8).cast(DecimalType(18, 8)) *
              $"n".cast(DecimalType(9, 0)) - $"__s".cast(DecimalType(28, 8)),
            $"n").as("char_entropy"))
        .orderBy($"doc_id")
    },

    // Unigram language-model quality score (the CCNet/Gopher-style LM
    // filter signal, with the corpus itself as the LM): per-doc mean
    // log2-probability of its tokens under corpus unigram frequencies.
    // Tokenize ONCE: everything derives from the per-(doc, token) count
    // aggregate — vocabulary and totals are aggregates OF it (exchange
    // reuse), and the per-doc sum weights each term's decimal-cast lp
    // by tf, which is exactly the per-occurrence sum (decimal × integer
    // is exact) in the order-independent decimal form, rounded once at
    // 4 decimals (the char_entropy treatment).
    "docs_unigram_logprob" -> { (s, dir) =>
      import s.implicits._
      val tf = Tables.documents(s, dir)
        .select($"doc_id", explode(TextFunctions.tokens($"text")).as("tok"))
        .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("tf"))
      val vocab = tf.groupBy($"tok").agg(sum($"tf").as("c"))
      val totals = vocab.agg(sum($"c").as("total"))
      tf.join(broadcast(vocab), Seq("tok"))
        .crossJoin(broadcast(totals))
        .select($"doc_id", $"tf",
          // round at 8 right after the libm calls (the repo's rounded-
          // transcendental recipe): unrounded, a 1-ulp Spark-vs-DuckDB
          // log2 divergence on some corpus count surfaces in the 4th
          // decimal of the mean — caught live at sf0.1 (r8).
          round(log2($"c".cast("double")) - log2($"total".cast("double")), 8)
            .cast(DecimalType(28, 10)).as("lp"))
        .groupBy($"doc_id")
        // (18,8)×(9,0) → (28,8): an unconstrained lp(28,10)×tf(20,0)
        // ideal type is (49,10) > 38, and Spark's allowPrecisionLoss
        // silently CLAMPS the product scale to 6 — each term loses its
        // 7th/8th decimal and the per-doc sum drifts ~1e-6 off the
        // oracle, flipping docs near a 4-dp boundary (the sf0.1 root
        // cause, r8: 6/5000 rows off by exactly 1e-4).
        .agg(sum($"tf").as("n_tokens"),
          sum($"lp".cast(DecimalType(18, 8)) *
            $"tf".cast(DecimalType(9, 0))).as("__S"))
        // Exact-integer HALF_UP mean: the quotient CAN land on a
        // .00005 tie, where round(double, 4) diverges across engines —
        // see Parity.exactMeanRound4.
        .select($"doc_id", $"n_tokens",
          Parity.exactMeanRound4($"__S", $"n_tokens").as("avg_logprob"))
        .orderBy($"doc_id")
    },

    // Bigram conditional LM quality score: per doc, the mean
    // log2 P(w_i | w_{i-1}) under the corpus MLE bigram model (c12/c1 —
    // unsmoothed is total because every doc bigram is in the corpus by
    // construction). Unlike the unigram scorer, the bigram vocabulary is
    // NOT broadcastable at scale, so this is the keyed-join shape: one
    // exchange for per-doc bigram counts (reused by both corpus tables),
    // joins keyed on bigram and on prefix; decimal-cast per-term values,
    // one final round.
    "docs_bigram_logprob" -> { (s, dir) =>
      import s.implicits._
      // Materialize the token array before bigramsFromTokens (its
      // documented contract): inlining tokens(text) into the per-element
      // lambdas would re-split the full text per token — O(tokens²)/doc.
      // Unsplittable-input spread (r14, guide §2.5): tokenize + bigram
      // explosion below the first aggregate, single-task otherwise.
      val bg = graft.util.Spread
        .spreadInput(Tables.documents(s, dir), $"doc_id")
        .select($"doc_id", TextFunctions.tokens($"text").as("__toks"))
        .select($"doc_id",
          explode(TextFunctions.bigramsFromTokens($"__toks")).as("bg"))
      val tf = bg.groupBy($"doc_id", $"bg").agg(count(lit(1)).as("tf"))
      val c2 = tf.groupBy($"bg").agg(sum($"tf").as("c2"))
        .withColumn("w1", substring_index($"bg", " ", 1))
      val c1 = c2.groupBy($"w1").agg(sum($"c2").as("c1"))
      // lp is a per-DISTINCT-bigram value: join the two corpus tables at
      // vocabulary scale first, then hit the doc-bigram table once — the
      // prefix join never touches instance-scale data.
      val voc = c2.join(c1, Seq("w1"))
        .select($"bg",
          // rounded-libm recipe — see docs_unigram_logprob.
          round(log2($"c2".cast("double")) - log2($"c1".cast("double")), 8)
            .cast(DecimalType(28, 10)).as("lp"))
      tf.join(voc, Seq("bg"))
        .groupBy($"doc_id")
        // Precision-safe product + tie-free exact mean — see
        // docs_unigram_logprob.
        .agg(sum($"tf").as("n_bigrams"),
          sum($"lp".cast(DecimalType(18, 8)) *
            $"tf".cast(DecimalType(9, 0))).as("__S"))
        .select($"doc_id", $"n_bigrams",
          Parity.exactMeanRound4($"__S", $"n_bigrams").as("avg_logprob"))
        .orderBy($"doc_id")
    },

    // Gopher/MassiveText-style quality-rule battery: word count, mean
    // word length, symbol-to-word ratio, alpha-word ratio, and distinct-
    // stopword presence, each thresholded into a boolean rule plus a
    // combined keep flag. The fixture corpus is uniform word soup, so
    // deterministic symbol/digit decorations (pure functions of doc_id,
    // mirrored by the oracle) make every rule genuinely bite. All ratios
    // are single divisions of exact integers — bit-identical across
    // engines, no rounding step needed. Pure projection: zero shuffle at
    // any corpus size.
    "docs_gopher_rules" -> { (s, dir) =>
      import s.implicits._
      val decorated = concat($"text",
        when($"doc_id" % 7 === 0, lit(" ### ... ###")).otherwise(lit("")),
        when($"doc_id" % 11 === 0,
          lit(" 101 202 303 404 505 606 707 808")).otherwise(lit("")))
      Tables.documents(s, dir)
        .select($"doc_id", decorated.as("__txt"))
        .select($"doc_id", $"__txt",
          TextFunctions.tokens($"__txt").as("__toks"))
        .select($"doc_id",
          size($"__toks").as("n_words"),
          TextFunctions.meanTokenLength($"__txt").as("mean_word_len"),
          TextFunctions.symbolWordRatio($"__txt", size($"__toks"))
            .as("symbol_ratio"),
          TextFunctions.alphaWordRatio($"__toks").as("alpha_ratio"),
          TextFunctions.distinctWordHits($"__toks",
            Seq("the", "a", "of", "to", "and")).as("n_stop_distinct"))
        .select($"doc_id", $"n_words", $"mean_word_len", $"symbol_ratio",
          $"alpha_ratio", $"n_stop_distinct",
          ($"n_words" >= 20 && $"n_words" <= 10000).as("r_word_count"),
          ($"mean_word_len" >= 3.0 && $"mean_word_len" <= 10.0)
            .as("r_mean_len"),
          ($"symbol_ratio" <= 0.1).as("r_symbol"),
          ($"alpha_ratio" >= 0.9).as("r_alpha"),
          ($"n_stop_distinct" >= 2).as("r_stop"))
        .withColumn("keep", $"r_word_count" && $"r_mean_len" &&
          $"r_symbol" && $"r_alpha" && $"r_stop")
        .orderBy($"doc_id")
    },

    // Unicode normalization + accent stripping (the canonicalization
    // pass before fingerprint/dedup, so composed and decomposed
    // encodings hash identically). The fixture is pure ASCII, so each
    // row plants a decomposed e+U+0301 and precomposed é/ü/ñ (mirrored
    // chr-for-chr by the oracle); NFC shrinks the decomposed pair to one
    // code point, strip_accents folds all four to bare letters. Runs the
    // native codegen expressions — Spark has no normalization builtin.
    "text_normalize" -> { (s, dir) =>
      import s.implicits._
      val decorated = concat($"text", lit(" caf"),
        // Escapes, not raw glyphs: the first marker is the DECOMPOSED
        // e + U+0301 and must stay decomposed in source (an editor
        // NFC-normalizing the file would silently change the query).
        lit("e\u0301 \u00e9\u00fc\u00f1"))
      Tables.documents(s, dir)
        .select($"doc_id", decorated.as("__txt"))
        .orderBy($"doc_id")
        .select($"doc_id",
          length($"__txt").as("n_raw"),
          graft.GraftFunctions.unicodeNorm($"__txt", "NFC").as("nfc"),
          length(graft.GraftFunctions.unicodeNorm($"__txt", "NFC"))
            .as("n_nfc"),
          graft.GraftFunctions.stripAccents($"__txt").as("stripped"))
    },

    // Domain-authority PageRank over the planted link graph (3
    // iterations, d=0.85): each doc contributes sub{id%7}.example.com →
    // news{id%5}.example.org and the news host links back to
    // sub{(id+3)%7}.example.com — 12 hosts, 1000 weighted edges, every
    // node with in- and out-degree. Per-iteration contribution sums run
    // in exact decimal and round once at 10 decimals, so the oracle
    // replays the iterations bit-for-bit. The per-domain sampling
    // weight a web-corpus pipeline derives from its crawl graph.
    "docs_pagerank" -> { (s, dir) =>
      import s.implicits._
      val subHost = concat(lit("sub"), ($"doc_id" % 7).cast("string"),
        lit(".example.com"))
      val subHost3 = concat(lit("sub"), (($"doc_id" + 3) % 7).cast("string"),
        lit(".example.com"))
      val newsHost = concat(lit("news"), ($"doc_id" % 5).cast("string"),
        lit(".example.org"))
      val docs = Tables.documents(s, dir)
      val edges = docs.select(subHost.as("src"), newsHost.as("dst"))
        .unionAll(docs.select(newsHost.as("src"), subHost3.as("dst")))
      graft.ops.Graph.pageRank(edges, "src", "dst")
        .withColumnRenamed("pr", "pagerank")
        .orderBy($"node")
    },

    // Weakly-connected components over a planted bipartite host graph:
    // a{id%6} — b{id%15}. Residues agree mod 3 (CRT), so the 21 hosts
    // split into exactly 3 components with canonical ids a0/a1/a2 — the
    // cluster step of mirror-site detection. The 500-doc fixture covers
    // all residues, so the shape is sf-independent; the graph is small
    // enough for the driver union-find tier, while DedupSpec covers the
    // distributed min-label tier on bigger graphs.
    "docs_components" -> { (s, dir) =>
      import s.implicits._
      val edges = Tables.documents(s, dir).select(
        concat(lit("a"), ($"doc_id" % 6).cast("string")).as("src"),
        concat(lit("b"), ($"doc_id" % 15).cast("string")).as("dst"))
      graft.ops.Graph.connectedComponents(edges, "src", "dst")
        .orderBy($"node")
    },

    // In/out-degree profile of the PageRank link graph (parallel edges
    // counted — they are crawl-frequency weights). Hub/authority
    // screening: the first signal a crawl-frontier prioritizer reads.
    "docs_degrees" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val subHost = concat(lit("sub"), ($"doc_id" % 7).cast("string"),
        lit(".example.com"))
      val subHost3 = concat(lit("sub"), (($"doc_id" + 3) % 7).cast("string"),
        lit(".example.com"))
      val newsHost = concat(lit("news"), ($"doc_id" % 5).cast("string"),
        lit(".example.org"))
      val edges = docs.select(subHost.as("src"), newsHost.as("dst"))
        .unionAll(docs.select(newsHost.as("src"), subHost3.as("dst")))
      graft.ops.Graph.degrees(edges, "src", "dst").orderBy($"node")
    },

    // Dispersion/correlation from exact decimal moments: Σx, Σx², Σd,
    // Σd², Σxd summed in decimal, rounded once at scale 6, then combined
    // with the textbook formulas in doubles. Engine-independent where the
    // built-in stddev/corr aggregates (streaming merges) are not.
    "q_stats_battery" -> { (s, dir) =>
      import s.implicits._
      def d(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 4))
      def m6(c: org.apache.spark.sql.Column) =
        c.cast(DecimalType(38, 6)).cast("double")
      val agg = Tables.lineitem(s, dir).groupBy($"l_returnflag").agg(
        count(lit(1)).as("n"),
        m6(sum(d($"l_quantity"))).as("sx"),
        m6(sum(d($"l_quantity") * d($"l_quantity"))).as("sxx"),
        m6(sum(d($"l_discount"))).as("sd"),
        m6(sum(d($"l_discount") * d($"l_discount"))).as("sdd"),
        m6(sum(d($"l_quantity") * d($"l_discount"))).as("sxd"))
      val nD = $"n".cast("double")
      agg.select($"l_returnflag", $"n",
        ($"sx" / nD).as("mean_qty"),
        sqrt((nD * $"sxx" - $"sx" * $"sx") / (nD * (nD - lit(1.0))))
          .as("stddev_qty"),
        ((nD * $"sxd" - $"sx" * $"sd") /
          (sqrt(nD * $"sxx" - $"sx" * $"sx") *
            sqrt(nD * $"sdd" - $"sd" * $"sd"))).as("corr_qty_disc"))
        .orderBy($"l_returnflag")
    })

  private def plantedSql =
    """text || ' contact user' || CAST(doc_id AS VARCHAR) ||
      |  '@mail.example.com or https://ex.org/d/' || CAST(doc_id AS VARCHAR) ||
      |  ' tel (' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') ||
      |  ') 555-0199 ssn 078-05-1120 ref ' ||
      |  CAST(doc_id*doc_id + 123456 AS VARCHAR) || '.'""".stripMargin

  val oracles: Map[String, String] = Map(

    "sketch_kmv_distinct" ->
      """WITH h AS (SELECT DISTINCT l_returnflag,
        |    ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || ':kmv'), 1, 13))::BIGINT AS hv
        |  FROM lineitem),
        |k AS (SELECT l_returnflag, hv,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY hv) AS rn
        |  FROM h)
        |SELECT l_returnflag, COUNT(*) AS n_kept, MAX(hv) AS kth_hash,
        |  CASE WHEN COUNT(*) < 256 THEN COUNT(*)
        |       ELSE (255 * 4503599627370496) // MAX(hv) END AS est_distinct
        |FROM k WHERE rn <= 256 GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // Replays sketch → pair → union-slice → shared-count → estimate; the
    // only doubles are the final ratio·union product, IEEE-identical.
    "sketch_kmv_overlap" ->
      """WITH h AS (SELECT DISTINCT source,
        |    ('0x' || substr(md5(md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'))
        |       || ':kmvo'), 1, 13))::BIGINT AS hv
        |  FROM documents WHERE text IS NOT NULL),
        |sk AS (SELECT source, (list_sort(list(hv)))[1:16] AS hs
        |  FROM h GROUP BY source),
        |pairs AS (SELECT a.source AS source_a, b.source AS source_b,
        |    a.hs AS ha, b.hs AS hb,
        |    (list_sort(list_distinct(a.hs || b.hs)))[1:16] AS hu
        |  FROM sk a JOIN sk b ON a.source < b.source),
        |m AS (SELECT source_a, source_b,
        |    CAST(len(hu) AS BIGINT) AS n_kept,
        |    CAST(len(list_intersect(hu, list_intersect(ha, hb))) AS BIGINT) AS n_shared,
        |    CASE WHEN len(hu) < 16 THEN CAST(len(hu) AS BIGINT)
        |         ELSE (15 * 4503599627370496) // hu[len(hu)] END AS est_union
        |  FROM pairs)
        |SELECT source_a, source_b, n_kept, n_shared, est_union,
        |  CAST(round(CAST(n_shared AS DOUBLE) / n_kept * est_union) AS BIGINT)
        |    AS est_intersection
        |FROM m ORDER BY source_a, source_b""".stripMargin,

    "sketch_hll_buckets" ->
      """WITH h AS (SELECT l_returnflag,
        |    ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || ':hll'), 1, 13))::BIGINT AS hv
        |  FROM lineitem),
        |r AS (SELECT l_returnflag, hv % 64 AS bucket,
        |    CASE WHEN hv // 64 = 0 THEN 47
        |         ELSE 47 - len(bin(hv // 64)) END AS rho
        |  FROM h)
        |SELECT l_returnflag, bucket, CAST(MAX(rho) AS INTEGER) AS max_rho
        |FROM r GROUP BY l_returnflag, bucket ORDER BY l_returnflag, bucket""".stripMargin,

    "text_tfidf_top" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token FROM documents),
        |t AS (SELECT doc_id, token FROM toks WHERE token <> ''),
        |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM t GROUP BY doc_id, token),
        |df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM t GROUP BY token),
        |n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
        |s AS (SELECT tf.doc_id, tf.token, tf.tf,
        |    round(tf.tf * round(ln(CAST(n.n_docs AS DOUBLE) / df.df), 4), 4) AS score
        |  FROM tf JOIN df USING (token) CROSS JOIN n),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token) AS rn
        |  FROM s)
        |SELECT doc_id, token, tf, score FROM r WHERE rn <= 3
        |ORDER BY doc_id, score DESC, token""".stripMargin,

    // Replays Bm25.topK term for term: idf is the one libm step rounded
    // at 4; per-term scores round at 8, sum as DECIMAL(28,10) (exact,
    // order-free), final round 4. All float literals CAST to DOUBLE so
    // DuckDB stays in IEEE arithmetic (its bare decimals are DECIMAL) and
    // the tf-normalization chain is written in the engine's exact textual
    // shape, so both sides run the identical float sequence.
    "text_bm25_topk" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> t <> '') AS tk
        |  FROM documents),
        |base AS (SELECT doc_id, len(tk) AS dl, unnest(tk) AS token FROM toks),
        |tf AS (SELECT doc_id, token, COUNT(*) AS tf, MAX(dl) AS dl
        |  FROM base GROUP BY doc_id, token),
        |df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
        |stats AS (SELECT COUNT(*) AS n_docs, AVG(len(tk)) AS avgdl FROM toks),
        |q AS (SELECT doc_id AS query_id, unnest(list_distinct(tk[1:6])) AS token
        |  FROM toks WHERE doc_id < 5),
        |scored AS (
        |  SELECT q.query_id, tf.doc_id,
        |    CAST(round(
        |      round(ln((stats.n_docs - df.df + CAST(0.5 AS DOUBLE))
        |          / (df.df + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE)), 4)
        |      * (tf.tf * CAST(2.2 AS DOUBLE) / (tf.tf + CAST(1.2 AS DOUBLE)
        |          * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
        |             + CAST(0.75 AS DOUBLE) * tf.dl / stats.avgdl))),
        |      8) AS DECIMAL(28,10)) AS term_score
        |  FROM tf JOIN q USING (token) JOIN df USING (token) CROSS JOIN stats),
        |agg AS (SELECT query_id, doc_id,
        |    CAST(round(SUM(term_score), 4) AS DOUBLE) AS score
        |  FROM scored GROUP BY query_id, doc_id),
        |r AS (SELECT *, row_number() OVER (
        |    PARTITION BY query_id ORDER BY score DESC, doc_id) AS rn FROM agg)
        |SELECT query_id, doc_id, score FROM r WHERE rn <= 10
        |ORDER BY query_id, score DESC, doc_id""".stripMargin,

    // Replays the md5-affine prepare/slot family: ONE 28-bit md5 base per
    // key, then h_j = (a_j * base + j) mod 2^31-1 with a_j =
    // (2654435761 * (j+1)) mod 2^30 + 1 — identical to Sketches.base28 /
    // affineSlot.
    "sketch_cms_probe" ->
      """WITH keys AS (SELECT l_suppkey AS k FROM lineitem WHERE l_suppkey IS NOT NULL),
        |js AS (SELECT unnest([0, 1, 2, 3]) AS j,
        |  unnest([(2654435761 * 1) % 1073741824 + 1,
        |          (2654435761 * 2) % 1073741824 + 1,
        |          (2654435761 * 3) % 1073741824 + 1,
        |          (2654435761 * 4) % 1073741824 + 1]) AS a),
        |cells AS (SELECT j,
        |    ((a * (('0x' || substr(md5(CAST(k AS VARCHAR) || ':cms'), 1, 7))::BIGINT) + j)
        |      % 2147483647) % 1024 AS col,
        |    COUNT(*) AS cnt
        |  FROM keys CROSS JOIN js GROUP BY j, col),
        |probes AS (SELECT CAST(range AS BIGINT) AS key FROM range(1, 21)),
        |pc AS (SELECT p.key, js.j,
        |    ((js.a * (('0x' || substr(md5(CAST(p.key AS VARCHAR) || ':cms'), 1, 7))::BIGINT) + js.j)
        |      % 2147483647) % 1024 AS col
        |  FROM probes p CROSS JOIN js)
        |SELECT pc.key AS l_suppkey, MIN(COALESCE(c.cnt, 0)) AS est_count
        |FROM pc LEFT JOIN cells c ON pc.j = c.j AND pc.col = c.col
        |GROUP BY pc.key ORDER BY l_suppkey""".stripMargin,

    "sketch_bloom_member" ->
      """WITH keys AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_custkey IS NOT NULL),
        |js AS (SELECT unnest([0, 1, 2]) AS j,
        |  unnest([(2654435761 * 1) % 1073741824 + 1,
        |          (2654435761 * 2) % 1073741824 + 1,
        |          (2654435761 * 3) % 1073741824 + 1]) AS a),
        |bits AS (SELECT DISTINCT
        |    ((a * (('0x' || substr(md5(CAST(k AS VARCHAR) || ':bloom'), 1, 7))::BIGINT) + j)
        |      % 2147483647) % 8192 AS pos
        |  FROM keys CROSS JOIN js),
        |probes AS (SELECT CAST(range AS BIGINT) AS key FROM range(1, 11)
        |  UNION ALL SELECT CAST(range AS BIGINT) FROM range(9000001, 9000011)),
        |pb AS (SELECT p.key, js.j,
        |    ((js.a * (('0x' || substr(md5(CAST(p.key AS VARCHAR) || ':bloom'), 1, 7))::BIGINT) + js.j)
        |      % 2147483647) % 8192 AS pos
        |  FROM probes p CROSS JOIN js)
        |SELECT pb.key, BOOL_AND(b.pos IS NOT NULL) AS maybe_member
        |FROM pb LEFT JOIN bits b ON pb.pos = b.pos
        |GROUP BY pb.key ORDER BY key""".stripMargin,

    "sketch_quantiles" ->
      """WITH h AS (SELECT l_returnflag,
        |    ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '_' ||
        |       CAST(l_linenumber AS VARCHAR) || ':quant'), 1, 13))::BIGINT AS hv,
        |    l_extendedprice AS v
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |r AS (SELECT l_returnflag, hv, v,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY hv, v) AS rn
        |  FROM h),
        |a AS (SELECT l_returnflag, COUNT(*) AS n, list_sort(list(v)) AS vs
        |  FROM r WHERE rn <= 1024 GROUP BY l_returnflag)
        |SELECT l_returnflag, q, vs[CAST(floor(q * (n - 1)) AS INTEGER) + 1] AS value
        |FROM a CROSS JOIN (
        |  SELECT CAST(unnest([0.1, 0.25, 0.5, 0.75, 0.9, 0.99]) AS DOUBLE) AS q) qs
        |ORDER BY l_returnflag, q""".stripMargin,

    "text_scrub_pii" -> s"""
      |WITH f AS (SELECT doc_id, $plantedSql AS txt FROM documents)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(txt, '$emailRe')) AS INTEGER) AS n_emails,
      |  CAST(len(regexp_extract_all(txt, '$urlRe')) AS INTEGER) AS n_urls,
      |  CAST(len(regexp_extract_all(txt, '$ssnRe')) AS INTEGER) AS n_ssns,
      |  CAST(len(regexp_extract_all(txt, '$phoneRe')) AS INTEGER) AS n_phones,
      |  CAST(len(regexp_extract_all(txt, '$numRe')) AS INTEGER) AS n_nums,
      |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      |    regexp_replace(txt,
      |    '$emailRe', '<EMAIL>', 'g'),
      |    '$urlRe', '<URL>', 'g'),
      |    '$ssnRe', '<SSN>', 'g'),
      |    '$phoneRe', '<PHONE>', 'g'),
      |    '$numRe', '<NUM>', 'g') AS scrubbed
      |FROM f ORDER BY doc_id""".stripMargin,

    "text_top_bigrams" ->
      """WITH t AS (SELECT string_split(lower(text), ' ') AS toks FROM documents),
        |b AS (SELECT unnest(list_transform(range(1, len(toks)),
        |    i -> toks[i] || ' ' || toks[i+1])) AS bigram FROM t)
        |SELECT bigram, COUNT(*) AS n_occurrences
        |FROM b GROUP BY bigram
        |ORDER BY n_occurrences DESC, bigram LIMIT 20""".stripMargin,

    "text_url_domains" -> s"""
      |WITH f AS (SELECT doc_id,
      |  text || ' see https://sub' || CAST(doc_id % 7 AS VARCHAR)
      |    || '.site' || CAST(doc_id % 13 AS VARCHAR)
      |    || '.example.com/page/' || CAST(doc_id AS VARCHAR)
      |    || ' and http://news' || CAST(doc_id % 5 AS VARCHAR)
      |    || '.example.org/a?id=' || CAST(doc_id AS VARCHAR) AS txt
      |  FROM documents),
      |u AS (SELECT doc_id,
      |  unnest(regexp_extract_all(txt, '$urlRe')) AS url FROM f)
      |SELECT regexp_extract(url, '^[A-Za-z]+://([^/:?#]+)', 1) AS host,
      |  COUNT(*) AS n_urls, COUNT(DISTINCT doc_id) AS n_docs
      |FROM u GROUP BY host ORDER BY host""".stripMargin,

    "text_strip_html" ->
      """WITH f AS (SELECT doc_id,
        |  '<div class="doc-' || CAST(doc_id AS VARCHAR) || '"><h1>t</h1><p>'
        |    || text || '</p><br/></div>' AS html
        |  FROM documents)
        |SELECT doc_id, CAST(length(html) AS INTEGER) AS n_raw,
        |  trim(regexp_replace(regexp_replace(html, '<[^>]*>', ' ', 'g'), '\s+', ' ', 'g')) AS cleaned
        |FROM f ORDER BY doc_id""".stripMargin,

    "docs_unigram_logprob" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents),
         |vocab AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
         |tot AS (SELECT SUM(c) AS total FROM vocab),
         |scored AS (
         |  SELECT doc_id,
         |    CAST(round(log2(CAST(c AS DOUBLE)) - log2(CAST(total AS DOUBLE)), 8)
         |      AS DECIMAL(28,10)) AS lp
         |  FROM toks JOIN vocab USING (tok) CROSS JOIN tot),
         |m AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |    SUM(CAST(lp AS DECIMAL(18,8))) AS s
         |  FROM scored GROUP BY doc_id)
         |SELECT doc_id, n_tokens,
         |  ${Parity.exactMeanRound4Sql("s", "n_tokens")} AS avg_logprob
         |FROM m ORDER BY doc_id""".stripMargin,

    // Replays docs_bigram_logprob: adjacent-token pairs (1-based list
    // slicing), corpus bigram and prefix counts, log2 MLE conditional per
    // instance decimal-cast before the tf-weighted mean.
    "docs_bigram_logprob" ->
      s"""WITH toks AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents),
        |bg AS (
        |  SELECT doc_id, unnest([tk[i] || ' ' || tk[i+1]
        |    FOR i IN range(1, len(tk))]) AS bg
        |  FROM toks),
        |tf AS (SELECT doc_id, bg, COUNT(*) AS tf FROM bg GROUP BY doc_id, bg),
        |c2 AS (SELECT bg, CAST(SUM(tf) AS BIGINT) AS c2 FROM tf GROUP BY bg),
        |c1 AS (SELECT split_part(bg, ' ', 1) AS w1, CAST(SUM(c2) AS BIGINT) AS c1
        |  FROM c2 GROUP BY w1),
        |scored AS (
        |  SELECT tf.doc_id, tf.tf,
        |    CAST(round(log2(CAST(c2 AS DOUBLE)) - log2(CAST(c1 AS DOUBLE)), 8)
        |      AS DECIMAL(28,10)) AS lp
        |  FROM tf JOIN c2 USING (bg)
        |  JOIN c1 ON split_part(tf.bg, ' ', 1) = c1.w1),
        |m AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_bigrams,
        |    SUM(CAST(lp AS DECIMAL(18,8)) * CAST(tf AS DECIMAL(9,0))) AS s
        |  FROM scored GROUP BY doc_id)
        |SELECT doc_id, n_bigrams,
        |  ${Parity.exactMeanRound4Sql("s", "n_bigrams")} AS avg_logprob
        |FROM m ORDER BY doc_id""".stripMargin,

    "text_char_entropy" ->
      s"""WITH c AS (SELECT doc_id, len(text) AS n,
         |    unnest(string_split(text, '')) AS ch
         |  FROM documents),
         |g AS (SELECT doc_id, n, COUNT(*) AS cnt FROM c GROUP BY doc_id, n, ch),
         |h AS (SELECT doc_id, n,
         |    CAST(round(log2(CAST(n AS DOUBLE)), 8) AS DECIMAL(18,8))
         |        * CAST(n AS DECIMAL(9,0))
         |      - SUM(CAST(cnt AS DECIMAL(9,0)) *
         |          CAST(round(log2(CAST(cnt AS DOUBLE)), 8) AS DECIMAL(18,8))) AS u
         |  FROM g GROUP BY doc_id, n)
         |SELECT doc_id,
         |  ${Parity.exactMeanRound4Sql("u", "n")} AS char_entropy
         |FROM h ORDER BY doc_id""".stripMargin,

    // Decorations mirror the Spark side chr-for-chr; every ratio is one
    // division of exact integers, so booleans compare bit-identically.
    "docs_gopher_rules" ->
      """WITH f AS (SELECT doc_id,
        |    text
        |      || CASE WHEN doc_id % 7 = 0 THEN ' ### ... ###' ELSE '' END
        |      || CASE WHEN doc_id % 11 = 0
        |           THEN ' 101 202 303 404 505 606 707 808' ELSE '' END AS txt
        |  FROM documents),
        |t AS (SELECT doc_id, txt, string_split(lower(txt), ' ') AS toks FROM f),
        |m AS (SELECT doc_id,
        |    CAST(len(toks) AS INTEGER) AS n_words,
        |    CAST(length(txt) - len(toks) + 1 AS DOUBLE)
        |      / CAST(greatest(len(toks), 1) AS DOUBLE) AS mean_word_len,
        |    CAST(len(regexp_extract_all(txt, '#'))
        |       + len(regexp_extract_all(txt, '\.\.\.')) AS DOUBLE)
        |      / CAST(greatest(len(toks), 1) AS DOUBLE) AS symbol_ratio,
        |    CAST(len(list_filter(toks, x -> regexp_matches(x, '\p{L}'))) AS DOUBLE)
        |      / CAST(greatest(len(toks), 1) AS DOUBLE) AS alpha_ratio,
        |    CAST(len(list_intersect(toks, ['the','a','of','to','and'])) AS INTEGER)
        |      AS n_stop_distinct
        |  FROM t)
        |SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_ratio,
        |  n_stop_distinct,
        |  n_words BETWEEN 20 AND 10000 AS r_word_count,
        |  mean_word_len BETWEEN 3.0 AND 10.0 AS r_mean_len,
        |  symbol_ratio <= 0.1 AS r_symbol,
        |  alpha_ratio >= 0.9 AS r_alpha,
        |  n_stop_distinct >= 2 AS r_stop,
        |  (n_words BETWEEN 20 AND 10000) AND (mean_word_len BETWEEN 3.0 AND 10.0)
        |    AND symbol_ratio <= 0.1 AND alpha_ratio >= 0.9
        |    AND n_stop_distinct >= 2 AS keep
        |FROM m ORDER BY doc_id""".stripMargin,

    // Replays Graph.pageRank iteration-for-iteration. The CASTs to
    // DOUBLE are load-bearing: bare 1.0 - 0.85 is DECIMAL arithmetic in
    // DuckDB (exactly 0.15) while the Scala driver computes the double
    // 0.15000000000000002 — forcing double subtraction reproduces it.
    "docs_pagerank" -> {
      def iter(prev: String, cur: String): String =
        s"""$cur AS (
           |  SELECT nd.node,
           |    round((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
           |      + CAST(0.85 AS DOUBLE) * COALESCE(
           |          CAST(SUM(CAST(p.pr / o.od AS DECIMAL(38,18))) AS DOUBLE),
           |          CAST(0.0 AS DOUBLE)), 10) AS pr
           |  FROM nodes nd CROSS JOIN n nn
           |  LEFT JOIN e ON e.dst = nd.node
           |  LEFT JOIN $prev p ON p.node = e.src
           |  LEFT JOIN outdeg o ON o.src = e.src
           |  GROUP BY nd.node, nn.n)""".stripMargin
      s"""WITH e AS (
         |  SELECT 'sub' || CAST(doc_id % 7 AS VARCHAR) || '.example.com' AS src,
         |         'news' || CAST(doc_id % 5 AS VARCHAR) || '.example.org' AS dst
         |  FROM documents
         |  UNION ALL
         |  SELECT 'news' || CAST(doc_id % 5 AS VARCHAR) || '.example.org',
         |         'sub' || CAST((doc_id + 3) % 7 AS VARCHAR) || '.example.com'
         |  FROM documents),
         |nodes AS (SELECT DISTINCT node FROM (
         |  SELECT src AS node FROM e UNION SELECT dst FROM e)),
         |n AS (SELECT COUNT(*) AS n FROM nodes),
         |outdeg AS (SELECT src, COUNT(*) AS od FROM e GROUP BY src),
         |p0 AS (SELECT node, CAST(1.0 AS DOUBLE) / nn.n AS pr
         |  FROM nodes CROSS JOIN n nn),
         |${iter("p0", "p1")},
         |${iter("p1", "p2")},
         |${iter("p2", "p3")}
         |SELECT node, pr AS pagerank FROM p3 ORDER BY node""".stripMargin
    },

    // Transitive closure over the undirected planted bipartite graph;
    // min reachable id (self included) = the component's canonical id.
    "docs_components" ->
      """WITH RECURSIVE pairs AS (
        |  SELECT DISTINCT 'a' || CAST(doc_id % 6 AS VARCHAR) AS x,
        |         'b' || CAST(doc_id % 15 AS VARCHAR) AS y
        |  FROM documents),
        |edges AS (SELECT x, y FROM pairs UNION ALL SELECT y, x FROM pairs),
        |reach(x, y) AS (
        |  SELECT x, y FROM edges
        |  UNION
        |  SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x)
        |SELECT x AS node, least(x, min(y)) AS component
        |FROM reach GROUP BY x ORDER BY node""".stripMargin,

    "docs_degrees" ->
      """WITH e AS (
        |  SELECT 'sub' || CAST(doc_id % 7 AS VARCHAR) || '.example.com' AS src,
        |         'news' || CAST(doc_id % 5 AS VARCHAR) || '.example.org' AS dst
        |  FROM documents
        |  UNION ALL
        |  SELECT 'news' || CAST(doc_id % 5 AS VARCHAR) || '.example.org',
        |         'sub' || CAST((doc_id + 3) % 7 AS VARCHAR) || '.example.com'
        |  FROM documents),
        |o AS (SELECT src AS node, COUNT(*) AS out_degree FROM e GROUP BY src),
        |i AS (SELECT dst AS node, COUNT(*) AS in_degree FROM e GROUP BY dst)
        |SELECT COALESCE(o.node, i.node) AS node,
        |  COALESCE(out_degree, 0) AS out_degree,
        |  COALESCE(in_degree, 0) AS in_degree
        |FROM o FULL OUTER JOIN i ON o.node = i.node
        |ORDER BY node""".stripMargin,

    // chr(101)||chr(769) is the decomposed e + combining acute the Spark
    // side plants as "é"; 233/252/241 are precomposed é/ü/ñ.
    "text_normalize" ->
      """WITH f AS (SELECT doc_id,
        |    text || ' caf' || chr(101) || chr(769) || ' '
        |      || chr(233) || chr(252) || chr(241) AS txt
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(length(txt) AS INTEGER) AS n_raw,
        |  nfc_normalize(txt) AS nfc,
        |  CAST(length(nfc_normalize(txt)) AS INTEGER) AS n_nfc,
        |  strip_accents(txt) AS stripped
        |FROM f ORDER BY doc_id""".stripMargin,

    "q_stats_battery" ->
      """WITH s AS (SELECT l_returnflag, COUNT(*) AS n,
        |    CAST(round(SUM(CAST(l_quantity AS DECIMAL(18,4))), 6) AS DOUBLE) AS sx,
        |    CAST(round(SUM(CAST(l_quantity AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))), 6) AS DOUBLE) AS sxx,
        |    CAST(round(SUM(CAST(l_discount AS DECIMAL(18,4))), 6) AS DOUBLE) AS sd,
        |    CAST(round(SUM(CAST(l_discount AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))), 6) AS DOUBLE) AS sdd,
        |    CAST(round(SUM(CAST(l_quantity AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))), 6) AS DOUBLE) AS sxd
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  sx / CAST(n AS DOUBLE) AS mean_qty,
        |  sqrt((CAST(n AS DOUBLE) * sxx - sx * sx) /
        |    (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) AS stddev_qty,
        |  (CAST(n AS DOUBLE) * sxd - sx * sd) /
        |    (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx) *
        |     sqrt(CAST(n AS DOUBLE) * sdd - sd * sd)) AS corr_qty_disc
        |FROM s ORDER BY l_returnflag""".stripMargin)
}
