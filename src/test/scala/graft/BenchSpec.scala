package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins Bench's stdout contract: the archiver keeps only the TAIL of
  * stdout with a ~2 KB cap, and r7's line outgrew it (6 of 79 per-query
  * rows lost to head truncation). These tests make "the whole line
  * fits, worst case, for the WHOLE current inventory" a compile-time-ish
  * guarantee: adding queries until the line can overflow again fails
  * here first, naming the budget. No SparkSession needed. */
class BenchSpec extends AnyFunSuite {

  test("fq smart precision: ≤4 chars, ≤~5% rounding error at every magnitude") {
    assert(Bench.fq(0.137) == "0.14")
    assert(Bench.fq(0.2) == "0.2")
    assert(Bench.fq(0.994) == "0.99")
    assert(Bench.fq(0.996) == "1")
    assert(Bench.fq(2.56) == "2.6")
    assert(Bench.fq(9.94) == "9.9")
    assert(Bench.fq(9.96) == "10")
    assert(Bench.fq(57.981) == "58")
    assert(Bench.fq(0.0) == "0")
    // width bound feeds the line-budget test below
    for (v <- Seq(0.001, 0.09, 0.99, 1.04, 9.49, 10.4, 99.4, 999.4))
      assert(Bench.fq(v).length <= 4, s"fq($v)=${Bench.fq(v)} wider than 4 chars")
    // relative error bound: ≤ 5% or ≤ 5ms absolute on sub-0.1s rows
    for (v <- Seq(0.11, 0.49, 0.99, 1.01, 5.0, 9.9, 10.1, 57.981, 200.0)) {
      val err = math.abs(Bench.fq(v).toDouble - v) / v
      assert(err <= 0.051, s"fq($v)=${Bench.fq(v)} err=$err")
    }
  }

  test("strip removes trailing zeros without corrupting values") {
    assert(Bench.strip("1.00") == "1")
    assert(Bench.strip("0.20") == "0.2")
    assert(Bench.strip("10") == "10")
    assert(Bench.strip("0.00") == "0")
  }

  test("worst-case stat line for the FULL current inventory clears the archiver cap") {
    // every query at the widest fq rendering (4 chars), pessimistic
    // scalars — if this fits, any real run fits. Budget arithmetic:
    // 2048-byte tail cap − ~85 bytes of sbt epilogue ("[success] Total
    // time: …" captured after the line, r7-measured) − 7 bytes of
    // "[info] " prefix ≈ 1956 usable. The 1930 pin sits ~25 bytes (one
    // query's worst case) UNDER that deliberately: each added query
    // costs ~25 worst-case bytes, so the assert fires one query EARLY —
    // an early-warning to re-budget consciously (shave per-query
    // precision or move a field to the fidelity file), never a
    // truncation discovered in the next round's BENCH file.
    // 95 queries; successive re-budgets as the inventory grew: "q_"
    // prefix stripped (r8), "full"/"cpus" → fidelity (r8),
    // "n_queries"/"warm_s"/"total_med" → fidelity (r9 median flip),
    // "qpfx"/"n_errors"/"stat" → fidelity (93rd/94th queries), the
    // "incremental_" family prefix compressed to "i_" (95th query,
    // ~50 B), "_pipeline" → "_pl" + "substring" → "ss" (98th query,
    // ~56 B across 8 keys), "quality" → "ql" etc. (104th query,
    // ~32 B across 6 keys), and "weighted" → "wtd" etc. (107th query,
    // ~37 B — "key_transform" in the fidelity file documents all of
    // it), and "join" → "jn" etc. (110th, ~21 B across 8 keys): worst
    // case ~1913 after the 110th re-budget, headroom for <1 query before
    // the pin fires again — the NEXT added query must bring its own
    // re-budget.
    val names = SparkEntry.queries.keys.toSeq
    val results = names.map(_ -> 0.99)
    val line = Bench.statLine(results, 99.999,
      "sf0.1", Nil, degraded = true, 9999.999)
    assert(line.length <= 1930,
      s"stat line worst case is ${line.length} bytes — the ~1956-byte " +
        "usable budget (2 KB cap minus sbt epilogue) would truncate it; " +
        "shave per-query precision or move fields to the fidelity file")
  }

  test("line-key transform keeps keys unique; both rules applied") {
    val keys = SparkEntry.queries.keys.toSeq.map(Bench.lineKey)
    assert(keys.distinct.size == keys.size,
      "two inventory names collide after the line-key transform")
    val line = Bench.statLine(
      Seq("q_x" -> 0.5, "q1_agg" -> 0.3, "q_incremental_dedup" -> 0.7,
        "q_rain_pipeline" -> 0.2, "q_incremental_substring" -> 0.4), 1,
      "sf0.1", Nil, degraded = false, 2.1)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.readTree(line)
    assert(node.get("queries").has("x") && !node.get("queries").has("q_x"))
    assert(node.get("queries").has("q1agg"),
      "non-prefixed names pass through (modulo the underscore purge)")
    assert(node.get("queries").has("idd") &&
      !node.get("queries").has("incremental_dedup"))
    assert(node.get("queries").has("rainpl"), "_pipeline compresses to _pl")
    assert(node.get("queries").has("iss"), "both i_ and ss rules compose")
  }

  test("line-key transform is FROZEN for the current inventory (append-only contract)") {
    // Golden map pinned r19 (VERDICT r18 ask #2): cross-round per-key
    // joins broke twice on renames (r14, r18). From here the transform
    // is append-only — a NEW query may add a rule for its own key, but
    // every key below must keep mapping exactly as recorded. Any diff
    // here means a rename, which the next round's PERF comparison
    // cannot join; reject it unless the stat line physically cannot
    // fit (and then record the remap in OPTIMIZATION notes).
    val golden = Map(
    "q_epoch_shard" -> "epshd",
    "q_incremental_append" -> "iapp",
    "q_train_mix" -> "trmix",
    "q_substring_removal" -> "ssrm",
    "q_union_dedup" -> "undd",
    "q_c4_lines" -> "c4lines",
    "q_scan_project" -> "scanprj",
    "q_fuzzy_topk" -> "fztk",
    "q_fingerprint" -> "fp",
    "q_pivot" -> "pivot",
    "q1_agg" -> "q1agg",
    "q_bitext_mine" -> "bitxtmine",
    "q_incremental_dedup" -> "idd",
    "q_weighted_mean" -> "wtdmean",
    "q_tfidf" -> "tfidf",
    "q_stratified_sample" -> "stratsmp",
    "q_ann_lsh" -> "annlsh",
    "q_ann_adaptive" -> "annadp",
    "q_repetition" -> "rep",
    "q_corpus_pipeline" -> "corppl",
    "q_zorder_key" -> "zokey",
    "q_math_funcs" -> "mathfn",
    "q_minmax_dates" -> "mmdts",
    "q_incremental_boilerplate" -> "ibp",
    "q_doc_chunk" -> "docchk",
    "q_cube" -> "cube",
    "q_mix_temperature" -> "mixtemp",
    "q_rain_pipeline" -> "rainpl",
    "q_url_dedup" -> "urldd",
    "q_fuzzy_lookup" -> "fzlkp",
    "q_fuzzy_join" -> "fzjn",
    "q_simhash" -> "simhash",
    "q_null_positive" -> "nlpos",
    "q_hll_distinct" -> "hlldst",
    "q_seq_pack" -> "seqpack",
    "q_substring_dup" -> "ssdup",
    "q_pq_topk" -> "pqtk",
    "q_text_norm" -> "txtnorm",
    "q_corr_stats" -> "corrst",
    "q_group_count" -> "grpcnt",
    "q_json_extract" -> "jsonext",
    "q_ppl_bucket" -> "pplbkt",
    "q_overlap_join" -> "ovlpjn",
    "q_weighted_sample" -> "wtdsmp",
    "q_window_tumbling" -> "wintumb",
    "q_train_split" -> "trspl",
    "q_budget_fill" -> "bdgfl",
    "q_bm25_index" -> "bm25idx",
    "q_risk_pipeline" -> "riskpl",
    "q_window_rownum" -> "winrn",
    "q_lm_fluency" -> "lmflu",
    "q_len_quantiles" -> "lenqnts",
    "q_bpe_fertility" -> "bpefert",
    "q_trailing_agg" -> "trlagg",
    "q_window_nav" -> "winnav",
    "q_incident_pipeline" -> "incpl",
    "q_case_buckets" -> "csbkts",
    "q_rollup" -> "rollup",
    "q_token_count" -> "tokcnt",
    "q_len_hist" -> "lenhist",
    "q_boilerplate" -> "bp",
    "q_ann_topk" -> "anntk",
    "q_html_text" -> "htmltxt",
    "q_prep_pipeline" -> "pppl",
    "q_frame_sample" -> "framesmp",
    "q_filter_range" -> "fltrng",
    "q_resample" -> "rsmp",
    "q_dedup_exact" -> "ddex",
    "q_join_graph" -> "jngr",
    "q_incremental_substring" -> "iss",
    "q_graph_day" -> "grday",
    "q_bpe_ids" -> "bpeids",
    "q_sort_multi" -> "sortmlt",
    "q_approx_quantile" -> "apxqnt",
    "q_domain_filter" -> "domflt",
    "q_range_join" -> "rngjn",
    "q_annpq_delete" -> "annpqdel",
    "q_date_parts" -> "datepts",
    "q_media_meta" -> "mdmeta",
    "q_quality_score" -> "qlsc",
    "q_semi_join" -> "semijn",
    "q_embed_cosine" -> "embcos",
    "q_gopher" -> "gopher",
    "q_media_features" -> "mdfeat",
    "q_index_delete" -> "idxdel",
    "q_list_page" -> "listpg",
    "q_profile" -> "profile",
    "q_running_total" -> "runtot",
    "q_minhash_lsh" -> "mhlsh",
    "q_funnel" -> "funnel",
    "q_contamination" -> "contam",
    "q_join_enrich" -> "jnenr",
    "q_session_window" -> "sesswin",
    "q_set_ops" -> "setops",
    "q_keep_canonical" -> "kpcanon",
    "q_semdedup" -> "semdd",
    "q_cms_counts" -> "cmscnts",
    "q_top_terms" -> "toptrm",
    "q_bm25" -> "bm25",
    "q_embed_centroid" -> "embctr",
    "q_skew_agg" -> "skagg",
    "q_filter_isin" -> "fltisin",
    "q_lm_trigram" -> "lmtri",
    "q_incremental_tokenize" -> "itok",
    "q_ann_delete" -> "anndel",
    "q_promo_revenue" -> "prrev",
    "q_dedup_groups" -> "ddgrps",
    "q_pii_redact" -> "piired",
    "q_dsir_select" -> "dsirsel",
    "q_ann_ivf" -> "annivf",
    "q_para_dedup" -> "paradd",
    "q_embed_cosine_lsh" -> "embcoslsh",
    "q_anti_join" -> "antjn",
    "q_asof_join" -> "aojn",
    "q_ffd_summary" -> "ffdsum",
    "q_ngram_jaccard" -> "ngjac",
    "q_ffd_pack" -> "ffdpack",
    "q_approx_distinct" -> "apxdst",
    "q_ann_incremental" -> "annincr",
    "q_topk" -> "tk",
    "q_bpe_tokenize" -> "bpetok",
    "q_paginate" -> "pgn",
    "q_dedup_keys" -> "ddkeys",
    "q_mix_upsample" -> "mixups",
    "q_bpe_vocab" -> "bpevocab",
    "q_lang_id" -> "langid",
    "q_asof_fwd" -> "aofwd",
    "q_quality_pipeline" -> "qlpl",
    "q_hybrid_rrf" -> "hybrrf",
    "q_tok_pack" -> "tokpack",
    "q_coalesce_fill" -> "coalfl",
    "q_ann_filter" -> "annflt",
    "q_group_sample" -> "grpsmp"
    )
    val inv = SparkEntry.queries.keys.toSet
    assert(golden.keySet.subsetOf(inv),
      s"golden names missing from inventory: ${golden.keySet -- inv}")
    val bad = golden.collect { case (n, k) if Bench.lineKey(n) != k =>
      s"$n: ${Bench.lineKey(n)} != $k" }
    assert(bad.isEmpty, "line-key renames detected:\n" + bad.mkString("\n"))
  }

  test("host_throttled flags only a genuinely slower end-canary") {
    assert(!Bench.hostThrottledFlag(0.5, 0.25), "warming canary is normal")
    assert(!Bench.hostThrottledFlag(0.5, 0.6), "1.2x is inside noise")
    assert(Bench.hostThrottledFlag(0.5, 0.75), "1.5x end-canary = host slowed")
    assert(!Bench.hostThrottledFlag(0.0, 1.0), "failed canary never flags")
  }

  test("stat line is valid JSON with the driver-contract fields") {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val line = Bench.statLine(Seq("q1_agg" -> 0.37, "q_x" -> 12.0),
      1.2, "sf0.1",
      Seq("q_bad" -> "boom \"quoted\" \\ msg"), degraded = false, 12.37)
    val node = om.readTree(line)
    assert(node.get("metric").asText == "total")
    assert(node.get("unit").asText == "sec")
    assert(node.get("value").asDouble == 12.37)
    assert(node.get("queries").get("q1agg").asDouble == 0.37)
    assert(node.get("queries").get("x").asDouble == 12.0)
    assert(node.get("errors").get("q_bad").asText.contains("quoted"))
    assert(node.get("errors").size == 1)
    assert(!node.get("degraded").asBoolean)
    assert(node.get("load1m").asDouble == 1.2)
  }

  test("hostile or long sf names can neither corrupt nor bloat the line") {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val line = Bench.statLine(Seq("q1_agg" -> 0.37), 1.2,
      "a\"b\\c" + ("y" * 50), Nil, degraded = false, 0.37)
    val node = om.readTree(line) // must parse — quotes/backslashes neutralized
    assert(node.get("sf").asText.length <= 24, "sf field must stay bounded")
    assert(!node.get("sf").asText.contains("\"") && !node.get("sf").asText.contains("\\"))
  }
}
