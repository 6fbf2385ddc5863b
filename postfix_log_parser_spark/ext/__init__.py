"""LLM-training-data pipeline extensions (north-star operators).

These are first-class engine components beyond the reference's own scope:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding
cosine), similarity search over embeddings, text analysis, and multimodal
column plumbing — all designed scale-first (bucketed joins, no all-pairs
on the scale path, no collect loops).
"""

from postfix_log_parser_spark.ext.aqeskew import AQESKEW_ORACLES, AQESKEW_QUERIES
from postfix_log_parser_spark.ext.bpe import BPE_ORACLES, BPE_QUERIES
from postfix_log_parser_spark.ext.budget import BUDGET_ORACLES, BUDGET_QUERIES
from postfix_log_parser_spark.ext.cascade import CASCADE_ORACLES, CASCADE_QUERIES
from postfix_log_parser_spark.ext.cluster import CLUSTER_ORACLES, CLUSTER_QUERIES
from postfix_log_parser_spark.ext.export import EXPORT_ORACLES, EXPORT_QUERIES
from postfix_log_parser_spark.ext.dedup import DEDUP_ORACLES, DEDUP_QUERIES
from postfix_log_parser_spark.ext.dialogs import DIALOGS_ORACLES, DIALOGS_QUERIES
from postfix_log_parser_spark.ext.editjoin import (
    EDITJOIN_ORACLES,
    EDITJOIN_QUERIES,
)
from postfix_log_parser_spark.ext.corpus import CORPUS_ORACLES, CORPUS_QUERIES
from postfix_log_parser_spark.ext.dpp import DPP_ORACLES, DPP_QUERIES
from postfix_log_parser_spark.ext.embqc import EMBQC_ORACLES, EMBQC_QUERIES
from postfix_log_parser_spark.ext.entity import ENTITY_ORACLES, ENTITY_QUERIES
from postfix_log_parser_spark.ext.formats import FORMATS_ORACLES, FORMATS_QUERIES
from postfix_log_parser_spark.ext.graph import GRAPH_ORACLES, GRAPH_QUERIES
from postfix_log_parser_spark.ext.ksdrift import KSDRIFT_ORACLES, KSDRIFT_QUERIES
from postfix_log_parser_spark.ext.layout import LAYOUT_ORACLES, LAYOUT_QUERIES
from postfix_log_parser_spark.ext.leakage import LEAKAGE_ORACLES, LEAKAGE_QUERIES
from postfix_log_parser_spark.ext.metastats import (
    METASTATS_ORACLES,
    METASTATS_QUERIES,
)
from postfix_log_parser_spark.ext.multimodal import (
    MULTIMODAL_ORACLES,
    MULTIMODAL_QUERIES,
)
from postfix_log_parser_spark.ext.normalize import (
    NORMALIZE_ORACLES,
    NORMALIZE_QUERIES,
)
from postfix_log_parser_spark.ext.packing import PACKING_ORACLES, PACKING_QUERIES
from postfix_log_parser_spark.ext.pipeline import PIPELINE_ORACLES, PIPELINE_QUERIES
from postfix_log_parser_spark.ext.privacy import PRIVACY_ORACLES, PRIVACY_QUERIES
from postfix_log_parser_spark.ext.profile import PROFILE_ORACLES, PROFILE_QUERIES
from postfix_log_parser_spark.ext.projection import (
    PROJECTION_ORACLES,
    PROJECTION_QUERIES,
)
from postfix_log_parser_spark.ext.quantize import QUANTIZE_ORACLES, QUANTIZE_QUERIES
from postfix_log_parser_spark.ext.retrieval import (
    RETRIEVAL_ORACLES,
    RETRIEVAL_QUERIES,
)
from postfix_log_parser_spark.ext.sampling import SAMPLING_ORACLES, SAMPLING_QUERIES
from postfix_log_parser_spark.ext.classify import CLASSIFY_ORACLES, CLASSIFY_QUERIES
from postfix_log_parser_spark.ext.spans import SPANS_ORACLES, SPANS_QUERIES
from postfix_log_parser_spark.ext.streamann import (
    STREAMANN_ORACLES,
    STREAMANN_QUERIES,
)
from postfix_log_parser_spark.ext.streambm25 import (
    STREAMBM25_ORACLES,
    STREAMBM25_QUERIES,
)
from postfix_log_parser_spark.ext.streamcc import (
    STREAMCC_ORACLES,
    STREAMCC_QUERIES,
)
from postfix_log_parser_spark.ext.skew import SKEW_ORACLES, SKEW_QUERIES
from postfix_log_parser_spark.ext.sketches import (
    SKETCHES_ORACLES,
    SKETCHES_QUERIES,
)
from postfix_log_parser_spark.ext.similarity import (
    SIMILARITY_ORACLES,
    SIMILARITY_QUERIES,
)
from postfix_log_parser_spark.ext.textstats import (
    TEXTSTATS_ORACLES,
    TEXTSTATS_QUERIES,
)
from postfix_log_parser_spark.ext.udtfs import UDTF_ORACLES, UDTF_QUERIES
from postfix_log_parser_spark.ext.vocab import VOCAB_ORACLES, VOCAB_QUERIES
from postfix_log_parser_spark.ext.timeseries import (
    TIMESERIES_ORACLES,
    TIMESERIES_QUERIES,
)
from postfix_log_parser_spark.ext.topk import TOPK_ORACLES, TOPK_QUERIES

EXT_QUERIES = {
    **AQESKEW_QUERIES,
    **BUDGET_QUERIES,
    **CASCADE_QUERIES,
    **DEDUP_QUERIES,
    **DIALOGS_QUERIES,
    **EDITJOIN_QUERIES,
    **SIMILARITY_QUERIES,
    **TEXTSTATS_QUERIES,
    **METASTATS_QUERIES,
    **MULTIMODAL_QUERIES,
    **NORMALIZE_QUERIES,
    **PACKING_QUERIES,
    **PIPELINE_QUERIES,
    **PRIVACY_QUERIES,
    **KSDRIFT_QUERIES,
    **LAYOUT_QUERIES,
    **LEAKAGE_QUERIES,
    **CLUSTER_QUERIES,
    **QUANTIZE_QUERIES,
    **SAMPLING_QUERIES,
    **PROFILE_QUERIES,
    **PROJECTION_QUERIES,
    **TIMESERIES_QUERIES,
    **SKETCHES_QUERIES,
    **SKEW_QUERIES,
    **GRAPH_QUERIES,
    **ENTITY_QUERIES,
    **FORMATS_QUERIES,
    **EXPORT_QUERIES,
    **BPE_QUERIES,
    **CORPUS_QUERIES,
    **UDTF_QUERIES,
    **VOCAB_QUERIES,
    **RETRIEVAL_QUERIES,
    **SPANS_QUERIES,
    **STREAMCC_QUERIES,
    **STREAMANN_QUERIES,
    **STREAMBM25_QUERIES,
    **CLASSIFY_QUERIES,
    **TOPK_QUERIES,
    **DPP_QUERIES,
    **EMBQC_QUERIES,
}

EXT_ORACLES = {
    **AQESKEW_ORACLES,
    **BUDGET_ORACLES,
    **CASCADE_ORACLES,
    **DEDUP_ORACLES,
    **DIALOGS_ORACLES,
    **EDITJOIN_ORACLES,
    **SIMILARITY_ORACLES,
    **TEXTSTATS_ORACLES,
    **METASTATS_ORACLES,
    **MULTIMODAL_ORACLES,
    **NORMALIZE_ORACLES,
    **PACKING_ORACLES,
    **PIPELINE_ORACLES,
    **PRIVACY_ORACLES,
    **KSDRIFT_ORACLES,
    **LAYOUT_ORACLES,
    **LEAKAGE_ORACLES,
    **CLUSTER_ORACLES,
    **QUANTIZE_ORACLES,
    **SAMPLING_ORACLES,
    **PROFILE_ORACLES,
    **PROJECTION_ORACLES,
    **TIMESERIES_ORACLES,
    **SKETCHES_ORACLES,
    **SKEW_ORACLES,
    **GRAPH_ORACLES,
    **ENTITY_ORACLES,
    **FORMATS_ORACLES,
    **EXPORT_ORACLES,
    **BPE_ORACLES,
    **CORPUS_ORACLES,
    **UDTF_ORACLES,
    **VOCAB_ORACLES,
    **RETRIEVAL_ORACLES,
    **SPANS_ORACLES,
    **STREAMCC_ORACLES,
    **STREAMANN_ORACLES,
    **STREAMBM25_ORACLES,
    **CLASSIFY_ORACLES,
    **TOPK_ORACLES,
    **DPP_ORACLES,
    **EMBQC_ORACLES,
}
