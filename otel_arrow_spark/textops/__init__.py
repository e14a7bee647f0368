"""Text / training-data operators: dedup, similarity search, text analysis,
multimodal plumbing.

These extend the reference's operator surface with the operations a
large-scale training-data pipeline needs (dedup, ANN, quality scoring);
they follow the same design rules as the telemetry operators: DataFrame
primitives first, Arrow-vectorized UDFs only where built-ins can't express
the semantics, one shuffle per logical regroup.
"""

from otel_arrow_spark.textops.dedup import (  # noqa: F401
    dedup_exact,
    embedding_near_dup_pairs,
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
)
from otel_arrow_spark.textops.similarity import (  # noqa: F401
    brute_force_topk,
    cosine_similarity_col,
    lsh_bucketed_topk,
)
from otel_arrow_spark.textops.analysis import (  # noqa: F401
    document_fingerprint,
    language_id,
    quality_score,
    token_stats,
)
from otel_arrow_spark.textops.ivf import (  # noqa: F401
    ivf_topk,
    train_centroids,
    write_ivf_index,
)
from otel_arrow_spark.textops.scrub import (  # noqa: F401
    benchmark_ngrams,
    flag_contaminated,
    redact_pii,
    repetition_stats,
)
from otel_arrow_spark.textops.paragraphs import (  # noqa: F401
    paragraph_dedup,
    split_paragraphs,
    write_paragraph_corpus,
)
