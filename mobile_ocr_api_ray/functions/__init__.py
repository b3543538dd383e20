"""Pure scalar operators — byte-exact ports of the reference's deterministic
functions (SURVEY.md §2.8, F1–F9)."""

from .textproc import (  # noqa: F401
    split_into_sentences,
    tokenize,
    score_sentences,
    summarize,
    compression_ratio,
    join_pages,
)
from .stopwords import STOP_WORDS  # noqa: F401
from .routing import route_quality, QUALITY_PARAMS  # noqa: F401
