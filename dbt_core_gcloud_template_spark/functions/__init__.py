from .hashing import md5_int28, md5_int28_sql, md5_int60, md5_int60_sql, MINHASH_PRIME
from .text import tokens_expr, tokens_sql

__all__ = [
    "md5_int28",
    "md5_int28_sql",
    "md5_int60",
    "md5_int60_sql",
    "MINHASH_PRIME",
    "tokens_expr",
    "tokens_sql",
]
