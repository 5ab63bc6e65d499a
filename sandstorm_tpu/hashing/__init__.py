from .blake2s import blake2s_words, hash_rows, hash_node_pairs

__all__ = ["blake2s_words", "hash_rows", "hash_node_pairs"]
