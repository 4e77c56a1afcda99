from .text import extract_text_py, extract_text_udf  # noqa: F401
