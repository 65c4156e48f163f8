"""Human-evaluation analysis (the reference's ``illusions_rating`` study)."""

from .ratings import (
    GALLERY_MODEL_SCORES,
    attention_check_pass,
    correlate_with_model_scores,
    filter_participants,
    normalize_per_participant,
    summarize,
    welch_tests_vs_control,
)

__all__ = [
    "GALLERY_MODEL_SCORES",
    "attention_check_pass",
    "filter_participants",
    "normalize_per_participant",
    "summarize",
    "welch_tests_vs_control",
    "correlate_with_model_scores",
]
