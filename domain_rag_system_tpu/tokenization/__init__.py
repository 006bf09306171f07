from domain_rag_system_tpu.tokenization.regex_tokenizer import RegexTokenizer, Vocabulary
from domain_rag_system_tpu.tokenization.wordpiece import WordPieceTokenizer, train_wordpiece

__all__ = ["RegexTokenizer", "Vocabulary", "WordPieceTokenizer", "train_wordpiece"]
