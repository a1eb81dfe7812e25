"""Deterministic column-expression helpers shared by operators and oracles."""

from flink_net_spark.functions.hashing import (
    MOD,
    MULT,
    duckdb_char_polyhash,
    duckdb_minhash_sig,
    duckdb_shingle_hashes,
    duckdb_word_shingles,
    minhash_coeffs,
    spark_char_polyhash,
    spark_minhash_sig,
    spark_shingle_hashes,
    spark_word_shingles,
)

__all__ = [
    "MOD",
    "MULT",
    "minhash_coeffs",
    "spark_char_polyhash",
    "duckdb_char_polyhash",
    "spark_word_shingles",
    "duckdb_word_shingles",
    "spark_shingle_hashes",
    "duckdb_shingle_hashes",
    "spark_minhash_sig",
    "duckdb_minhash_sig",
]
