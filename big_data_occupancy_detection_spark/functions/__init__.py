from .datetime_fns import dow_monday
from .text_fns import char_ngrams, norm_text, tokens, word_ngrams
from .vector_fns import cosine_similarity, dot, l2_norm

__all__ = [
    "dow_monday",
    "norm_text",
    "tokens",
    "char_ngrams",
    "word_ngrams",
    "cosine_similarity",
    "dot",
    "l2_norm",
]
