from top2vec_spark.functions.tokenizer import (
    reference_tokenize,
    strip_tags,
    deaccent,
    tokenize_udf,
    sql_tokens_expr,
)

__all__ = [
    "reference_tokenize",
    "strip_tags",
    "deaccent",
    "tokenize_udf",
    "sql_tokens_expr",
]
