from . import dedup, similarity, text, multimodal  # noqa: F401
