package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.datapipe.TrainingOps
import graft.spark._

/** Dev tool: dump formatted physical plans for the load-bearing claims
  * (run with `sbt "Test/runMain graft.PlanCheck"`):
  *   1. extraction spine = scan-stage kernel + ONE exchange of results
  *   2. metrics-only read of the results table prunes text/spans columns
  *   3. size gate is a pushable scan-level filter shape
  *   4. minhash LSH self-join shuffles only (band, bv) keys
  *   5. ann top-k broadcasts the probe side (no candidate shuffle)
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    implicit val s: SparkSession = spark
    import s.implicits._

    val sf = "/root/testdata/sf0.001"
    val out = "/tmp/plancheck_results"
    val pages = graft.gen.PagesGen.fromDocuments(spark, sf)

    println("==== 1. extraction spine ====")
    ExtractPipeline.run(pages, ExtractConf()).toDF().explain("formatted")

    println("==== 2. metrics-only read of results (column pruning) ====")
    ExtractPipeline.run(pages, ExtractConf()).toDF()
      .write.mode("overwrite").parquet(out)
    spark.read.parquet(out).groupBy("engine", "status").count().explain("formatted")

    println("==== 3. size-gate predicate placement ====")
    ExtractPipeline.prepared(pages, ExtractConf()).explain("formatted")

    println("==== 4. minhash LSH candidate join ====")
    TrainingOps.minhashPairs(spark.read.parquet(s"$sf/documents.parquet")).explain("formatted")

    println("==== 5. ann top-k probe broadcast ====")
    TrainingOps.annCosineTopK(spark.read.parquet(s"$sf/embeddings.parquet")).explain("formatted")

    println("==== 6. d7 scalable top-k: one bounded broadcast per probe chunk ====")
    TrainingOps.annCosineTopKScalable(spark.read.parquet(s"$sf/embeddings.parquet"))
      .explain("formatted")

    println("==== 7. d8 embedding near-dup: capped bucket join + candidate-only cosine ====")
    TrainingOps.embCosinePairs(spark.read.parquet(s"$sf/embeddings.parquet"))
      .explain("formatted")

    println("==== 8. d9 IVF top-k: cell-restricted broadcast join, no cartesian ====")
    TrainingOps.annIvfTopK(spark.read.parquet(s"$sf/embeddings.parquet"))
      .explain("formatted")

    println("==== 9. d10 dup clusters: (long,long) label/size joins only ====")
    TrainingOps.dupClusters(spark.read.parquet(s"$sf/documents.parquet"))
      .explain("formatted")

    println("==== 10. e17 windowed counts: 2-col event-time side, pruned join ====")
    SparkEntry.queries("e17_windowed_counts")(spark, sf).explain("formatted")

    println("==== 11. d11 paragraph dedup: md5-key first-occurrence join over cached chunks ====")
    TrainingOps.paragraphDedup(spark.read.parquet(s"$sf/documents.parquet"))
      .explain("formatted")

    println("==== 12. d12 decontamination: eval grams BROADCAST, training grams never shuffle ====")
    SparkEntry.queries("d12_decontaminate")(spark, sf).explain("formatted")

    println("==== 13. d13 incremental dedup: confirm join sees bloom-hit rows only ====")
    SparkEntry.queries("d13_incremental_dedup")(spark, sf).explain("formatted")

    println("==== 14. t11 global shuffle: one data exchange on shard, offsets broadcast ====")
    TrainingOps.globalShuffle(spark.read.parquet(s"$sf/documents.parquet"))
      .explain("formatted")

    println("==== 15. t12 unigram familiarity: vocab inlined, scoring pass map-only ====")
    TrainingOps.unigramFamiliarity(spark.read.parquet(s"$sf/documents.parquet"))
      .explain("formatted")

    println("==== 16. e20 sessionize: one key shuffle + native merging-sessions exec ====")
    SparkEntry.queries("e20_sessionize")(spark, sf).explain("formatted")

    println("==== 17. e21 status rollup: one Expand + partial/final agg, no union ====")
    SparkEntry.queries("e21_status_rollup")(spark, sf).explain("formatted")

    println("==== 18. t14 quality rules: map-only bundle, zero exchanges ====")
    TrainingOps.qualityRules(spark.read.parquet(s"$sf/documents.parquet"))
      .explain("formatted")

    println("==== 19. e22 outlinks: scan-stage link extraction, dedup carries (url, links) only ====")
    SparkEntry.queries("e22_outlinks")(spark, sf).explain("formatted")

    println("==== 20. e23 host rank: per-iteration (host,long) join + agg (lineage kept for the dump) ====")
    graft.datapipe.GraphOps.hostRank(
      Seq(("a", "b"), ("b", "a"), ("a", "c")).toDF("src", "dst"),
      iters = 2, truncateLineage = false).explain("formatted")

    println("==== 21. e24 anchor profile: two map-combined host aggs, min(struct) top anchor, no window ====")
    SparkEntry.queries("e24_anchor_profile")(spark, sf).explain("formatted")

    println("==== 22. t15 frequent ngrams: map-combined counts, salted two-stage top-K ====")
    TrainingOps.frequentNgrams(spark.read.parquet(s"$sf/documents.parquet"))
      .explain("formatted")

    println("==== 23. d14 semdedup: single cell-key self-join, key-only verdict join ====")
    TrainingOps.semDedup(spark.read.parquet(s"$sf/embeddings.parquet"))
      .explain("formatted")

    println("==== 24. e25 resolved links: scan-stage resolution, dedup carries (url, to_urls) only ====")
    SparkEntry.queries("e25_resolved_links")(spark, sf).explain("formatted")

    println("==== 25. e26 crawl frontier: map-combined target agg + LEFT ANTI on url key ====")
    SparkEntry.queries("e26_crawl_frontier")(spark, sf).explain("formatted")

    println("==== 26. d15 fuzzy decontamination: broadcast eval bands, no train-side cap ====")
    SparkEntry.queries("d15_fuzzy_decontaminate")(spark, sf).explain("formatted")

    println("==== 27. t16 tf-idf: two map-combined aggs, word-keyed scoring join, per-doc window ====")
    TrainingOps.tfidfKeywords(spark.read.parquet(s"$sf/documents.parquet"))
      .explain("formatted")

    println("==== 28. p2 web pipeline: one kernel pass (persisted), rank join host-keyed ====")
    SparkEntry.queries("p2_web_pipeline")(spark, sf).explain("formatted")

    println("==== 29. p3 bpe tokenize: map-only scoring after the driver-side learn ====")
    // bpeMerges itself runs its loop eagerly (its result is a driver-built
    // local frame — nothing to audit); the lazy half is the tokenize
    // stage, whose plan must be a single map-only projection
    TrainingOps.bpeTokenize(spark.read.parquet(s"$sf/documents.parquet"), nMerges = 2)
      .explain("formatted")

    println("==== 30. t20 quality classifier: training agg map-combined; scoring map-only ====")
    TrainingOps.qualityClassifier(spark.read.parquet(s"$sf/documents.parquet"))
      .explain("formatted")

    println("==== 31. t21 cms heavy hitters: sketch-gated filter below the exact count ====")
    TrainingOps.cmsHeavyHitters(spark.read.parquet(s"$sf/documents.parquet"))
      .explain("formatted")

    println("==== 32. t22 inverted index: ObjectHashAggregate partial/final, one exchange after distinct ====")
    TrainingOps.invertedIndex(spark.read.parquet(s"$sf/documents.parquet"))
      .explain("formatted")

    println("==== 33. t23 normalize: map-only transform chain, zero exchanges ====")
    TrainingOps.normalizeText(spark.read.parquet(s"$sf/documents.parquet"))
      .explain("formatted")

    println("==== 34. d16 pq codes: map-only encode, codebooks inlined ====")
    TrainingOps.pqCodes(spark.read.parquet(s"$sf/embeddings.parquet"))
      .explain("formatted")

    println("==== 35. d17 adc search: probes broadcast against the code table ====")
    TrainingOps.adcTopK(spark.read.parquet(s"$sf/embeddings.parquet"))
      .explain("formatted")

    println("==== 36. d18 substring dup: map-side window explode, hash-keyed dup join ====")
    TrainingOps.substringDup(spark.read.parquet(s"$sf/documents.parquet"))
      .explain("formatted")

    println("==== 37. e28 robots filter: host-keyed rule join + min(struct) longest match ====")
    SparkEntry.queries("e28_robots_filter")(spark, sf).explain("formatted")

    println("==== 38. e29 politeness schedule: salted two-stage windows, (url,host,count) shuffles only ====")
    SparkEntry.queries("e29_politeness_schedule")(spark, sf).explain("formatted")

    println("==== 39. e30 recrawl delta: hash projections below the full-outer key join ====")
    SparkEntry.queries("e30_recrawl_delta")(spark, sf).explain("formatted")

    println("==== 40. p5 crawl pipeline: frontier persisted at the branch; schedule over the doubly-gated set ====")
    SparkEntry.queries("p5_crawl_pipeline")(spark, sf).explain("formatted")

    println("==== 41. t24 HLL sketch: the only exchange carries (lang, bucket, rho), partial-aggregated map-side ====")
    SparkEntry.queries("t24_hll_distinct")(spark, sf).explain("formatted")

    println("==== 42. e31 bloom seen: probe is a literal-array map-only test (the audit join is the only exchange) ====")
    SparkEntry.queries("e31_bloom_seen")(spark, sf).explain("formatted")

    println("==== 43. t25 host boilerplate: detection shuffles (source, 8-byte h) only; strip joins BROADCAST ====")
    SparkEntry.queries("t25_host_boilerplate")(spark, sf).explain("formatted")

    println("==== 44. e32 url canonicalization: pure map-only project, zero exchange ====")
    SparkEntry.queries("e32_url_canonical")(spark, sf).explain("formatted")

    println("==== 45. m3 warc records: segment-parallel byte walk, map-only after the segment build ====")
    SparkEntry.queries("m3_warc_records")(spark, sf).explain("formatted")

    println("==== 46. p6 host table: ONE kernel parse persisted; host-keyed aggregate joins ====")
    SparkEntry.queries("p6_host_table")(spark, sf).explain("formatted")

    println("==== 47. d20 simhash pairs: join shuffles (blk, 15-bit bv, 8-byte simhash) rows only; signatures read from the persisted distinct-sig table ====")
    SparkEntry.queries("d20_simhash_pairs")(spark, sf).explain("formatted")

    println("==== 48. e33 domain rollup: PSL match is map-only codegen (no rule-table join); ONE exchange on (domain, host) partial distincts ====")
    SparkEntry.queries("e33_domain_rollup")(spark, sf).explain("formatted")

    println("==== 49. m4 image dims: typed map-only header walk, zero exchange ====")
    SparkEntry.queries("m4_image_dims")(spark, sf).explain("formatted")

    println("==== 50. p7 training handoff: extracted table persisted at the branch (lang/quality/dedup all read the cache, kernel never re-runs); doc_id-keyed joins only ====")
    SparkEntry.queries("p7_training_handoff")(spark, sf).explain("formatted")

    println("==== 51. d21 ann recall: truth leg persisted (hits + totals read it); eval joins are (q_id, vec_id) pointer rows ====")
    SparkEntry.queries("d21_ann_recall")(spark, sf).explain("formatted")

    println("==== 52. m5 charset: typed map-only three-rung sniff, zero exchange ====")
    SparkEntry.queries("m5_charset")(spark, sf).explain("formatted")

    println("==== 53. m6 http responses: typed map-only header walk, body addressed not copied, zero exchange ====")
    SparkEntry.queries("m6_http_responses")(spark, sf).explain("formatted")

    println("==== 54. e34 redirect resolution: per-round (url, url, int) joins, lineage truncated per hop ====")
    SparkEntry.queries("e34_resolve_redirects")(spark, sf).explain("formatted")

    println("==== 55. m7 fused warc+http reader: ONE map-only pass after the segment build, zero copies ====")
    SparkEntry.queries("m7_warc_http")(spark, sf).explain("formatted")

    println("==== 56. e35 page directives: typed map-only scan, zero exchange ====")
    SparkEntry.queries("e35_page_directives")(spark, sf).explain("formatted")

    println("==== 57. t29 script mix: codegen'd char-class counts, map-only, zero exchange ====")
    SparkEntry.queries("t29_script_mix")(spark, sf).explain("formatted")

    println("==== 58. p8 corpus release: shared survivor front persisted; pack windows partition by shard ====")
    SparkEntry.queries("p8_corpus_release")(spark, sf).explain("formatted")

    println("==== 59. e36 hreflang alternates: typed map-only flatMap scan, zero exchange ====")
    SparkEntry.queries("e36_hreflang_alternates")(spark, sf).explain("formatted")

    println("==== 60. e37 sitemap entries: typed map-only flatMap parse, zero exchange ====")
    SparkEntry.queries("e37_sitemap_entries")(spark, sf).explain("formatted")

    println("==== 61. t30 contamination report: eval grams broadcast; only matches shuffle into the eval-keyed distinct agg ====")
    SparkEntry.queries("t30_contamination_report")(spark, sf).explain("formatted")

    println("==== 62. d22 minhash calibration: one persisted shingle pass; candidate-only doc_id-keyed joins ====")
    SparkEntry.queries("d22_minhash_calibration")(spark, sf).explain("formatted")

    println("==== 63. m8 wav headers: typed map-only chunk walk, zero exchange ====")
    SparkEntry.queries("m8_wav_headers")(spark, sf).explain("formatted")

    println("==== 64. m9 gzip members: map-only inflate walk after the segment build ====")
    SparkEntry.queries("m9_gzip_members")(spark, sf).explain("formatted")

    println("==== 65. m10 cc reader: the fused gzip+warc+http stack, one map-only pass ====")
    SparkEntry.queries("m10_cc_reader")(spark, sf).explain("formatted")

    println("==== 66. e38 trap detection: map-only template derive, one map-side-combined count ====")
    SparkEntry.queries("e38_trap_detection")(spark, sf).explain("formatted")

    println("==== 67. d24 cluster reps: struct-min partial agg on cluster_id, NO window over clusters ====")
    SparkEntry.queries("d24_cluster_reps")(spark, sf).explain("formatted")

    println("==== 68. t31 token shards: every Window partitioned by bucket (no global-sort single task) ====")
    SparkEntry.queries("t31_token_shards")(spark, sf).explain("formatted")

    println("==== 69. m11 mp4 headers: typed map-only box walk, zero exchange ====")
    SparkEntry.queries("m11_mp4_headers")(spark, sf).explain("formatted")

    println("==== 70. d25 cdc chunks: O(n) kernel in the scan stage; shuffles carry (md5, ids) only, never chunk text ====")
    SparkEntry.queries("d25_cdc_chunks")(spark, sf).explain("formatted")

    println("==== 71. m12 chunked decode: typed map-only walk, decoded bytes feed the digest only ====")
    SparkEntry.queries("m12_chunked_decode")(spark, sf).explain("formatted")

    println("==== 72. t32 source overlap: ONE corpus pass into partial-agg k-heaps; pairwise stage joins the tiny sketch table only ====")
    SparkEntry.queries("t32_source_overlap")(spark, sf).explain("formatted")

    println("==== 73. d26 crawl novelty: union of gram streams, ONE hash-keyed shuffle with map-side-combined flags, tiny lang rollup ====")
    SparkEntry.queries("d26_crawl_novelty")(spark, sf).explain("formatted")

    println("==== 74. e39 revalidation: pure per-row CASE ladder, map-only zero exchange ====")
    SparkEntry.queries("e39_revalidation")(spark, sf).explain("formatted")

    println("==== 75. e40 table extract: kernel-tokenizer flatMap in the scan stage, zero exchange ====")
    SparkEntry.queries("e40_table_extract")(spark, sf).explain("formatted")

    println("==== 76. e41 heading outline: kernel-tokenizer flatMap in the scan stage, zero exchange ====")
    SparkEntry.queries("e41_heading_outline")(spark, sf).explain("formatted")

    println("==== 77. t33 section chunks: outline+window fused in ONE flatMap, no per-doc window function ====")
    SparkEntry.queries("t33_section_chunks")(spark, sf).explain("formatted")

    println("==== 78. t34 group sample: k-heap partial agg threshold + broadcast compare — NO per-group sort/window ====")
    SparkEntry.queries("t34_group_sample")(spark, sf).explain("formatted")

    println("==== 79. p9 refetch schedule: map-only policy+due, salted local top-k prefilter before the per-host rank ====")
    SparkEntry.queries("p9_refetch_schedule")(spark, sf).explain("formatted")

    println("==== 80. t36 C4 line scrub: pure map-only line filter, zero exchange ====")
    SparkEntry.queries("t36_c4_line_scrub")(spark, sf).explain("formatted")

    println("==== 81. t35 sentence split: construction + regex split + posexplode all in the scan stage, zero exchange ====")
    SparkEntry.queries("t35_sentences")(spark, sf).explain("formatted")

    println("==== 82. e42 feed entries: kernel flatMap in the scan stage, zero exchange ====")
    SparkEntry.queries("e42_feed_entries")(spark, sf).explain("formatted")

    println("==== 83. e43 pub dates: scan+resolve map in the scan stage, zero exchange ====")
    SparkEntry.queries("e43_pub_dates")(spark, sf).explain("formatted")

    println("==== 84. e44 HITS: per-iteration (host,long) join + map-side-combined agg; edges persisted once; flat plan via localCheckpoint ====")
    SparkEntry.queries("e44_hits")(spark, sf).explain("formatted")

    println("==== 85. e45 robots rules: kernel flatMap in the scan stage, zero exchange ====")
    SparkEntry.queries("e45_robots_rules")(spark, sf).explain("formatted")

    println("==== 86. p10 mixture plan: ONE map-side-combined corpus agg; totals as a single-row broadcast cross join ====")
    SparkEntry.queries("p10_mixture_plan")(spark, sf).explain("formatted")

    println("==== 87. m13 zip entries: typed mapPartitions walker in the scan stage, zero exchange ====")
    SparkEntry.queries("m13_zip_entries")(spark, sf).explain("formatted")

    println("==== 88. t37 blocklist hits: AC automaton scan rides the scan stage, zero exchange ====")
    SparkEntry.queries("t37_blocklist_hits")(spark, sf).explain("formatted")

    println("==== 89. t38 KN familiarity: word-keyed hash joins, global window only on the 1-in-10 sample, one-row cutoff broadcast ====")
    SparkEntry.queries("t38_kn_familiarity")(spark, sf).explain("formatted")

    println("==== 90. m14 tar entries: typed mapPartitions walker in the scan stage, zero exchange ====")
    SparkEntry.queries("m14_tar_entries")(spark, sf).explain("formatted")

    println("==== 91. t39 PMI collocations: two map-side-combined scans, prune-then-join on words, one-row total broadcast ====")
    SparkEntry.queries("t39_pmi_collocations")(spark, sf).explain("formatted")

    println("==== 92. d27 edit verify: banded levenshtein on LSH candidates only, broadcast-degenerate text-attach joins ====")
    SparkEntry.queries("d27_edit_verify")(spark, sf).explain("formatted")

    println("==== 93. t40 vocab growth: map-side-combined min-bucket aggregation, window only on the 16-row spine ====")
    SparkEntry.queries("t40_vocab_growth")(spark, sf).explain("formatted")

    println("==== 94. m15 tiff entries: typed mapPartitions pointer-graph walker in the scan stage, zero exchange ====")
    SparkEntry.queries("m15_tiff_entries")(spark, sf).explain("formatted")

    println("==== 95. t41 readability: pure per-row map, zero exchange ====")
    SparkEntry.queries("t41_readability")(spark, sf).explain("formatted")

    println("==== 96. e46 crawl depth: per-round host-keyed join + min agg, (host,int) rows only ====")
    SparkEntry.queries("e46_crawl_depth")(spark, sf).explain("formatted")

    println("==== 97. p11 curriculum: (band,shard)-windowed ranks + broadcast offsets, no global window ====")
    SparkEntry.queries("p11_curriculum")(spark, sf).explain("formatted")

    println("==== 98. t42 zipf ranks: map-side-combined word counts, salted top-K, tiny broadcast joins ====")
    SparkEntry.queries("t42_zipf_ranks")(spark, sf).explain("formatted")

    println("==== 99. m16 png chunks: typed mapPartitions riding the scan stage, zero exchange ====")
    SparkEntry.queries("m16_png_chunks")(spark, sf).explain("formatted")

    println("==== 100. t43 lexical diversity: ONE map-side-combined (doc,word) exchange, doc-keyed rollup ====")
    SparkEntry.queries("t43_lexical_diversity")(spark, sf).explain("formatted")

    println("==== 101. e47 sitemap coverage: url-keyed distincts + full-outer, count-only host rollup ====")
    SparkEntry.queries("e47_sitemap_coverage")(spark, sf).explain("formatted")

    println("==== 102. e48 components: per-round host-keyed join + map-side min, flat lineage ====")
    SparkEntry.queries("e48_components")(spark, sf).explain("formatted")

    println("==== 103. e49 triangles: degree-ordered wedge join on (host,host) pairs, hub-safe fan-out ====")
    SparkEntry.queries("e49_triangles")(spark, sf).explain("formatted")

    println("==== 104. m17 jpeg segments: typed mapPartitions length-driven walker in the scan stage, zero exchange ====")
    SparkEntry.queries("m17_jpeg_segments")(spark, sf).explain("formatted")

    println("==== 105. e50 soft404: pure per-row phrase/word counts, zero exchange ====")
    SparkEntry.queries("e50_soft404")(spark, sf).explain("formatted")

    println("==== 106. t44 mojibake: pure per-row marker counts, zero exchange ====")
    SparkEntry.queries("t44_mojibake")(spark, sf).explain("formatted")

    println("==== 107. e51 pagination chains: per-round url-keyed self-join on (url,ptr,int,bool) rows, flat lineage ====")
    SparkEntry.queries("e51_pagination_chains")(spark, sf).explain("formatted")

    println("==== 108. m18 mp3 frames: typed mapPartitions computed-length walker in the scan stage, zero exchange ====")
    SparkEntry.queries("m18_mp3_frames")(spark, sf).explain("formatted")

    println("==== 109. e52 canonical clusters: map-side directive scan, ONE target-keyed rollup, bodies never shuffle ====")
    SparkEntry.queries("e52_canonical_clusters")(spark, sf).explain("formatted")

    println("==== 110. p12 rendezvous shards: per-row argmax over keyed hashes, zero exchange ====")
    SparkEntry.queries("p12_rendezvous_shards")(spark, sf).explain("formatted")

    println("==== 111. t45 span corruption: typed mapPartitions in the scan stage, zero exchange ====")
    SparkEntry.queries("t45_span_corruption")(spark, sf).explain("formatted")

    println("==== 112. t46 fim transform: pure slice/concat expressions, whole-stage codegen, zero exchange ====")
    SparkEntry.queries("t46_fim_transform")(spark, sf).explain("formatted")

    println("==== 113. p13 compaction plan: metadata-plane windows + rollup over the shard manifest, data plane untouched ====")
    SparkEntry.queries("p13_compaction_plan")(spark, sf).explain("formatted")

    println("==== 114. m19 zstd frames: typed mapPartitions declared-extent walker in the scan stage, zero exchange ====")
    SparkEntry.queries("m19_zstd_frames")(spark, sf).explain("formatted")

    println("==== 115. p14 retention plan: ledger-sized recency window + map-side-combined last_snap rollup, broadcast join ====")
    SparkEntry.queries("p14_retention_plan")(spark, sf).explain("formatted")

    println("==== 116. e53 jsonld: map-side directive scan + codegen'd from_json, zero exchange ====")
    SparkEntry.queries("e53_jsonld")(spark, sf).explain("formatted")

    println("==== 117. m20 ebml elements: typed mapPartitions VINT walker in the scan stage, zero exchange ====")
    SparkEntry.queries("m20_ebml_elements")(spark, sf).explain("formatted")

    println("==== 118. p15 orphan plan: metadata-plane full-outer on the path key, map-side ref dedup ====")
    SparkEntry.queries("p15_orphan_plan")(spark, sf).explain("formatted")

    println("==== 119. e54 meta refresh: map-side directive scan + pure parse, zero exchange ====")
    SparkEntry.queries("e54_meta_refresh")(spark, sf).explain("formatted")

    println("==== 120. t47 nfc audit: pure per-row normalization in the scan stage, zero exchange ====")
    SparkEntry.queries("t47_nfc_audit")(spark, sf).explain("formatted")

    println("==== 121. d28 kmeans train: inlined-centroid map-only assignment + map-side-combined (cell,dim) sums ====")
    SparkEntry.queries("d28_kmeans_train")(spark, sf).explain("formatted")

    println("==== 122. m21 ogg pages: typed mapPartitions lacing-value walker in the scan stage, zero exchange ====")
    SparkEntry.queries("m21_ogg_pages")(spark, sf).explain("formatted")

    println("==== 123. t48 overlap chunks: split + closed-form explode + slice, whole-stage codegen, zero exchange ====")
    SparkEntry.queries("t48_overlap_chunks")(spark, sf).explain("formatted")

    println("==== 124. d29 ivf multiprobe: shared persisted cell index, broadcast probe-cell pairs, bounded per-probe window ====")
    SparkEntry.queries("d29_ivf_multiprobe")(spark, sf).explain("formatted")

    println("==== 125. m22 tfrecord records: typed mapPartitions double-checksum walker in the scan stage, zero exchange ====")
    SparkEntry.queries("m22_tfrecord_records")(spark, sf).explain("formatted")

    println("==== 126. e55 og harvest: map-side directive scan, zero exchange ====")
    SparkEntry.queries("e55_og_harvest")(spark, sf).explain("formatted")

    println("==== 127. e56 hreflang reciprocity: map-side parse + ONE reversed-pair self-join on url keys ====")
    SparkEntry.queries("e56_hreflang_reciprocity")(spark, sf).explain("formatted")

    println("==== 128. d30 semdedup curve: one pairwise pass, per-rep max reduce, 9-row broadcast grid ====")
    SparkEntry.queries("d30_semdedup_curve")(spark, sf).explain("formatted")

    println("==== 129. t49 token yield: 16-byte-key keeper groupBy + map-side source rollups, text never shuffles ====")
    SparkEntry.queries("t49_token_yield")(spark, sf).explain("formatted")

    println("==== 130. e57 link rot: ONE url-keyed left join + map-side host rollup over counter rows ====")
    SparkEntry.queries("e57_link_rot")(spark, sf).explain("formatted")

    println("==== 131. p16 epoch order: metadata-plane per-epoch rank window over the shard ledger ====")
    SparkEntry.queries("p16_epoch_order")(spark, sf).explain("formatted")

    println("==== 132. d31 dup histogram: ONE 16-byte-key groupBy + map-side bucket rollup ====")
    SparkEntry.queries("d31_dup_histogram")(spark, sf).explain("formatted")

    println("==== 133. t50 byte stats: pure per-row codegen'd built-ins, zero exchange ====")
    SparkEntry.queries("t50_byte_stats")(spark, sf).explain("formatted")

    println("==== 134. e58 title-og diff: two map-side scans per row, zero exchange ====")
    SparkEntry.queries("e58_title_og_diff")(spark, sf).explain("formatted")

    println("==== 135. m23 parquet footer: per-row 12-byte head/tail sniff, zero exchange ====")
    SparkEntry.queries("m23_parquet_footer")(spark, sf).explain("formatted")

    println("==== 136. m24 gif blocks: typed mapPartitions sub-block-chain walker in the scan stage, zero exchange ====")
    SparkEntry.queries("m24_gif_blocks")(spark, sf).explain("formatted")

    println("==== 137. t51 mlm mask: pure per-row array expressions (CSE'd keyed hashes), zero exchange ====")
    SparkEntry.queries("t51_mlm_mask")(spark, sf).explain("formatted")

    println("==== 138. d32 containment: 16-byte-key dedup + DF-capped rare-shingle block join + one set-join verify ====")
    SparkEntry.queries("d32_containment")(spark, sf).explain("formatted")

    println("==== 139. e59 mirror clusters: ONE 16-byte-key groupBy with two-phase distinct-host count, text never shuffles ====")
    SparkEntry.queries("e59_mirror_clusters")(spark, sf).explain("formatted")

    println("==== 140. p17 partition evolution: metadata-plane bounded explode + map-side-combined day rollup ====")
    SparkEntry.queries("p17_partition_evolution")(spark, sf).explain("formatted")

    println("==== 141. m25 flac blocks: typed mapPartitions u24be/bitfield walker in the scan stage, zero exchange ====")
    SparkEntry.queries("m25_flac_blocks")(spark, sf).explain("formatted")

    println("==== 142. e60 reciprocity: persisted distinct host pairs + reversal equi-join + map-side rollups ====")
    SparkEntry.queries("e60_reciprocity")(spark, sf).explain("formatted")

    println("==== 143. d33 ivf balance: shared persisted cell assignment + int-key count + 16-row spine ====")
    SparkEntry.queries("d33_ivf_balance")(spark, sf).explain("formatted")

    println("==== 144. m26 proto fields: typed mapPartitions varint walker in the scan stage, zero exchange ====")
    SparkEntry.queries("m26_proto_fields")(spark, sf).explain("formatted")

    println("==== 145. t52 casing profile: pure per-row codegen'd regex counting, zero exchange ====")
    SparkEntry.queries("t52_casing_profile")(spark, sf).explain("formatted")

    println("==== 146. e61 extract yield: kernel in the scan stage + ONE url-keyed join of two length columns ====")
    SparkEntry.queries("e61_extract_yield")(spark, sf).explain("formatted")

    println("==== 147. d34 ivf margins: inlined-centroid map-only sorted distance pairs, zero exchange ====")
    SparkEntry.queries("d34_ivf_margins")(spark, sf).explain("formatted")

    println("==== 148. e62 param profile: map-side query parse + ONE (host,param) rollup with two-phase distinct ====")
    SparkEntry.queries("e62_param_profile")(spark, sf).explain("formatted")

    println("==== 149. t53 entity residue: pure per-row codegen'd regex counting, zero exchange ====")
    SparkEntry.queries("t53_entity_residue")(spark, sf).explain("formatted")

    println("==== 150. e63 policy reconcile: typed map running both parsers per row, zero exchange ====")
    SparkEntry.queries("e63_policy_reconcile")(spark, sf).explain("formatted")

    println("==== 151. m27 webp chunks: typed mapPartitions RIFF walker with three dim codecs, zero exchange ====")
    SparkEntry.queries("m27_webp_chunks")(spark, sf).explain("formatted")

    println("==== 152. p18 backfill layers: metadata-plane iterative all-upstreams-placed joins, lineage truncated per round ====")
    SparkEntry.queries("p18_backfill_layers")(spark, sf).explain("formatted")

    println("==== 153. d35 bbit minhash: shared persisted sets/bands, doc_id-keyed candidate joins only ====")
    SparkEntry.queries("d35_bbit_minhash")(spark, sf).explain("formatted")

    println("==== 154. e64 alt coverage: typed map running the img scanner per row, zero exchange ====")
    SparkEntry.queries("e64_alt_coverage")(spark, sf).explain("formatted")

    println("==== 155. t54 burstiness: pure per-row split/aggregate integer moments, zero exchange ====")
    SparkEntry.queries("t54_burstiness")(spark, sf).explain("formatted")

    println("==== 156. d36 lsh planner: constant driver-side design table, fold-product doubles, no data read ====")
    SparkEntry.queries("d36_lsh_planner")(spark, sf).explain("formatted")

    println("==== 157. e65 host scorecard: two persisted host-graph ops + ONE host-keyed join + 1-row count cross ====")
    SparkEntry.queries("e65_host_scorecard")(spark, sf).explain("formatted")

    println("==== 158. t55 lang agreement: pure per-row stopword argmax beside the declared column, zero exchange ====")
    SparkEntry.queries("t55_lang_agreement")(spark, sf).explain("formatted")

    spark.stop()
  }
}
