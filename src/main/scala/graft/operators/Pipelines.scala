package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry of the training-data pipeline operators (dedup, similarity,
  * text analysis, multimodal) — merged into SparkEntry.queries alongside the
  * relational melt-parity queries. */
object Pipelines {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t01_token_count" -> TextAnalysis.t01TokenCount _,
    "t02_quality" -> TextAnalysis.t02Quality _,
    "t03_langid" -> TextAnalysis.t03LangId _,
    "t04_fingerprint" -> TextAnalysis.t04Fingerprint _,
    "t05_bpe_tokens" -> TextAnalysis.t05BpeTokens _,
    "t06_quality_topk" -> TextAnalysis.t06QualityTopK _,
    "t07_repetition" -> TextAnalysis.t07Repetition _,
    "t08_scrub" -> TextAnalysis.t08Scrub _,
    "t09_top_ngrams" -> TextAnalysis.t09TopNgrams _,
    "t10_common_ratio" -> TextAnalysis.t10CommonRatio _,
    "t11_quality_bins" -> TextAnalysis.t11QualityBins _,
    "t12_corpus_profile" -> TextAnalysis.t12CorpusProfile _,
    "t13_tfidf" -> TextAnalysis.t13Tfidf _,
    "t14_unigram_logprob" -> TextAnalysis.t14UnigramLogprob _,
    "t15_classifier_score" -> TextAnalysis.t15ClassifierScore _,
    "dd01_exact" -> Dedup.dd01Exact _,
    "dd02_ngram_jaccard" -> Dedup.dd02NgramJaccard _,
    "dd03_minhash_lsh" -> Dedup.dd03MinhashLsh _,
    "dd04_simhash" -> Dedup.dd04Simhash _,
    "dd05_simhash_pairs" -> Dedup.dd05SimhashPairs _,
    "dd06_neardup_clusters" -> Dedup.dd06NearDupClusters _,
    "dd07_passage_dedup" -> Dedup.dd07PassageDedup _,
    "dd08_incremental" -> Dedup.dd08IncrementalDedup _,
    "dd09_duplicate_spans" -> Dedup.dd09DuplicateSpans _,
    "ss01_cosine_topk" -> Similarity.ss01CosineTopK _,
    "ss02_neardup" -> Similarity.ss02NearDup _,
    "ss03_lsh_ann" -> Similarity.ss03LshAnn _,
    "ss04_lsh_neardup" -> Similarity.ss04LshNearDup _,
    "ss05_label_centroids" -> Similarity.ss05LabelCentroids _,
    "ss06_ivf_ann" -> Similarity.ss06IvfAnn _,
    "ss07_kmeans_assign" -> Similarity.ss07KmeansAssign _,
    "ss08_knn_join" -> Similarity.ss08KnnJoin _,
    "ss09_pq_encode" -> Similarity.ss09PqEncode _,
    "ss10_pq_adc" -> Similarity.ss10PqAdcTopK _,
    "ss11_pq_rerank" -> Similarity.ss11PqRerank _,
    "c01_curation" -> Curation.c01Curation _,
    "c02_cluster_curation" -> Curation.c02ClusterCuration _,
    "c03_semantic_curation" -> Curation.c03SemanticCuration _,
    "c04_decontaminate" -> Curation.c04Decontaminate _,
    "c05_diverse_sample" -> Curation.c05DiverseSample _,
    "m01_decode" -> Multimodal.m01Decode _,
    "m02_frames" -> Multimodal.m02Frames _,
    "m03_resize" -> Multimodal.m03Resize _,
    "sp01_split_sample" -> Sampling.sp01SplitSample _,
    "sp02_source_quota" -> Sampling.sp02SourceQuota _,
    "sp03_temperature_mix" -> Sampling.sp03TemperatureMix _,
    "sp04_pack_sequences" -> Sampling.sp04PackSequences _,
    "sp05_stratified_k" -> Sampling.sp05StratifiedK _,
    "sp06_shuffle_shard" -> Sampling.sp06ShuffleShard _,
  )

  val oracle: Map[String, String] = PipelineOracle.sql
}
