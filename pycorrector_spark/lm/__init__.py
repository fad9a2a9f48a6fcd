from .model import CharNgramLM, train_char_lm

__all__ = ["CharNgramLM", "train_char_lm"]
