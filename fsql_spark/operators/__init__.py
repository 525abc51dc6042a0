"""LLM-data-pipeline operator extensions (driver north star, SURVEY §2.6):
deduplication, similarity search, text analysis, multimodal columns."""

from .asof import (  # noqa: F401
    ASOF_ORACLES,
    ASOF_QUERIES,
    asof_join,
    range_join,
)
from .clustering import (  # noqa: F401
    CLUSTERING_ORACLES,
    CLUSTERING_QUERIES,
    cluster_representatives,
    connected_components,
)
from .decontam import (  # noqa: F401
    DECONTAM_ORACLES,
    DECONTAM_QUERIES,
    contamination_check,
    repetition_score,
)
from .dedup import (  # noqa: F401
    DEDUP_ORACLES,
    DEDUP_QUERIES,
    banding_for_threshold,
    bloom_build,
    corpus_bloom_cached,
    corpus_signatures_cached,
    dedup_against,
    dedup_against_bloom,
    dedup_exact,
    dedup_exact_keys,
    jaccard_pairs,
    minhash_lsh_pairs,
    minhash_lsh_pairs_against,
    minhash_signatures,
    prefix_filter_pairs,
    read_bloom,
    read_corpus_signatures,
    simhash,
    simhash_pairs,
    write_bloom,
    write_corpus_signatures,
)
from .graph import (  # noqa: F401
    GRAPH_ORACLES,
    GRAPH_QUERIES,
    order_graph_edges,
    pagerank,
    undirected_edges,
)
from .labelprop import (  # noqa: F401
    LABELPROP_ORACLES,
    LABELPROP_QUERIES,
    knn_graph,
    propagate_labels,
)
from .html import (  # noqa: F401
    HTML_ORACLES,
    HTML_QUERIES,
    documents_as_html,
    extract_html_text,
    extract_links,
)
from .inference import (  # noqa: F401
    INFERENCE_ORACLES,
    INFERENCE_QUERIES,
    fake_quality_model,
    hashed_embedding,
    score_with_model,
)
from .lm import (  # noqa: F401
    LM_ORACLES,
    LM_QUERIES,
    bigram_model,
    doc_bigram_cross_entropy,
    doc_bigram_cross_entropy_stateless,
    read_bigram_model,
    write_bigram_model,
    doc_cross_entropy,
    read_unigram_model,
    unigram_model,
    write_unigram_model,
)
from .bmp import decode_bmp, encode_bmp  # noqa: F401
from .codecs import (  # noqa: F401
    CodecError,
    decode_alaw,
    decode_au,
    decode_mulaw,
    decode_png,
    decode_wav,
    encode_png,
    encode_png_palette,
    encode_wav,
)
from .flac import decode_flac, encode_flac  # noqa: F401
from .gif import decode_gif, encode_gif  # noqa: F401
from .jpeg import decode_jpeg, encode_jpeg  # noqa: F401
from .multimodal import (  # noqa: F401
    MEDIA_SCHEMA,
    MULTIMODAL_ORACLES,
    MULTIMODAL_QUERIES,
    audio_window_energy,
    decode_audio,
    decode_audio_energy,
    decode_image,
    decode_image_stats,
    documents_as_audio,
    documents_as_gif,
    documents_as_jpeg,
    documents_as_media,
    documents_as_palette_png,
    documents_as_png,
    documents_as_tiff,
    documents_as_video,
    documents_as_wav,
    documents_as_webp,
    documents_as_webp_palette,
    extract_features,
    fake_decode_image,
    pack_flac,
    pack_video,
    pack_wav,
    pack_y4m,
    resize_images,
    sample_container_frames,
    sample_video_frames,
)
from .tiff import decode_tiff, encode_tiff  # noqa: F401
from .webp import decode_webp, encode_webp_lossless  # noqa: F401
from .video import decode_y4m, encode_y4m  # noqa: F401
from .passages import (  # noqa: F401
    PASSAGE_ORACLES,
    PASSAGE_QUERIES,
    containment_pairs_against,
    duplicated_passages,
    passage_dup_fraction,
    passage_windows,
    strip_duplicated_passages,
)
from .pipeline import (  # noqa: F401
    PIPELINE_ORACLES,
    PIPELINE_QUERIES,
    build_corpus,
    build_corpus_quality_gated,
)
from .profile import (  # noqa: F401
    PROFILE_ORACLES,
    PROFILE_QUERIES,
    histogram,
    profile,
)
from .rollup import (  # noqa: F401
    ROLLUP_ORACLES,
    ROLLUP_QUERIES,
    hourly_rollup,
    read_rollup,
    update_rollup,
)
from .sampling import (  # noqa: F401
    SAMPLING_ORACLES,
    SAMPLING_QUERIES,
    hash_fraction_sample,
    pack_shards,
    replicate_by_weight,
    sample_per_group,
    shuffle_deterministic,
    split_by_hash,
)
from .retrieval import (  # noqa: F401
    RETRIEVAL_ORACLES,
    RETRIEVAL_QUERIES,
    bm25_scores,
)
from .sketches import (  # noqa: F401
    SKETCH_ORACLES,
    SKETCH_QUERIES,
    count_min_cells,
    kmv_distinct,
    sampled_quantiles,
)
from .skew import (  # noqa: F401
    SKEW_ORACLES,
    SKEW_QUERIES,
    salted_join,
)
from .similarity import (  # noqa: F401
    SIMILARITY_ORACLES,
    SIMILARITY_QUERIES,
    assign_with_centroids,
    brute_force_pairs,
    brute_force_topk,
    cosine,
    dot,
    l2_norm,
    lsh_ann_pairs,
    quantize_embeddings,
    quantized_topk,
    read_ivf_centroids,
    write_ivf_centroids,
)
from .text import (  # noqa: F401
    TEXT_ORACLES,
    TEXT_QUERIES,
    fingerprint,
    gopher_rules,
    lang_id,
    normalize_text,
    quality_filter,
    quality_score,
    redact,
    token_count,
    winnow_fingerprints,
    with_text_stats,
)
from .bpe import (  # noqa: F401
    BPE_ORACLES,
    BPE_QUERIES,
    bpe_learn_merges,
    bpe_pair_stats,
    word_frequencies,
)
from .vocab import (  # noqa: F401
    VOCAB_ORACLES,
    VOCAB_QUERIES,
    term_frequencies,
    tf_idf,
    vocabulary,
)
from .spans import (  # noqa: F401
    SPAN_ORACLES,
    SPAN_QUERIES,
    duplicated_kgram_positions,
    duplicated_spans,
)
from .mixing import (  # noqa: F401
    MIXING_ORACLES,
    MIXING_QUERIES,
    source_js_divergence,
    source_token_probabilities,
)
from .phash import (  # noqa: F401
    PHASH_ORACLES,
    PHASH_QUERIES,
    perceptual_hashes,
    phash_clusters,
    phash_near_pairs,
)
from .sequence import (  # noqa: F401
    SEQUENCE_ORACLES,
    SEQUENCE_QUERIES,
    last_touch_attribution,
    transition_matrix,
)
from .dsir import (  # noqa: F401
    DSIR_ORACLES,
    DSIR_QUERIES,
    dsir_logratio_scores,
    gumbel_topk,
)
from .quality import (  # noqa: F401
    QUALITY_ORACLES,
    QUALITY_QUERIES,
    quality_classifier_fit,
    quality_classifier_score,
    quality_score_stateless,
)
from .domains import (  # noqa: F401
    DOMAIN_ORACLES,
    DOMAIN_QUERIES,
    domain_cap,
    domain_stats,
    parse_domain,
    topk_per_group,
)


def _merge_disjoint(*dicts: dict) -> dict:
    """Merge registries, REFUSING key collisions: a duplicate catalog name
    silently shadows the earlier entry (dict.update semantics), which is
    how round 11 briefly lost the round-8 q_bpe_token_counts entry to a
    same-named newcomer — fail loudly at import instead."""
    out: dict = {}
    for d in dicts:
        for k in d:
            if k in out:
                raise ValueError(
                    f"catalog key collision: {k!r} is registered twice — "
                    "rename one entry (duplicates silently shadow)"
                )
        out.update(d)
    return out


EXTENSION_QUERIES = _merge_disjoint(
    TEXT_QUERIES,
    DEDUP_QUERIES,
    SIMILARITY_QUERIES,
    MULTIMODAL_QUERIES,
    ASOF_QUERIES,
    PROFILE_QUERIES,
    SAMPLING_QUERIES,
    CLUSTERING_QUERIES,
    DECONTAM_QUERIES,
    INFERENCE_QUERIES,
    VOCAB_QUERIES,
    SKEW_QUERIES,
    PASSAGE_QUERIES,
    SKETCH_QUERIES,
    PIPELINE_QUERIES,
    LM_QUERIES,
    ROLLUP_QUERIES,
    RETRIEVAL_QUERIES,
    BPE_QUERIES,
    SPAN_QUERIES,
    MIXING_QUERIES,
    PHASH_QUERIES,
    GRAPH_QUERIES,
    LABELPROP_QUERIES,
    HTML_QUERIES,
    SEQUENCE_QUERIES,
    DSIR_QUERIES,
    QUALITY_QUERIES,
    DOMAIN_QUERIES,
)

EXTENSION_ORACLES = _merge_disjoint(
    TEXT_ORACLES,
    DEDUP_ORACLES,
    SIMILARITY_ORACLES,
    MULTIMODAL_ORACLES,
    ASOF_ORACLES,
    PROFILE_ORACLES,
    SAMPLING_ORACLES,
    CLUSTERING_ORACLES,
    DECONTAM_ORACLES,
    INFERENCE_ORACLES,
    VOCAB_ORACLES,
    SKEW_ORACLES,
    PASSAGE_ORACLES,
    SKETCH_ORACLES,
    PIPELINE_ORACLES,
    LM_ORACLES,
    ROLLUP_ORACLES,
    RETRIEVAL_ORACLES,
    BPE_ORACLES,
    SPAN_ORACLES,
    MIXING_ORACLES,
    PHASH_ORACLES,
    GRAPH_ORACLES,
    LABELPROP_ORACLES,
    HTML_ORACLES,
    SEQUENCE_ORACLES,
    DSIR_ORACLES,
    QUALITY_ORACLES,
    DOMAIN_ORACLES,
)
