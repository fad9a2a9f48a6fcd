from .core import Detector, Corrector, EnSpellCorrector, ErrorType

__all__ = ["Detector", "Corrector", "EnSpellCorrector", "ErrorType"]
