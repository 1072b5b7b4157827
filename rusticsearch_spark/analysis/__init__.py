from .analyzers import Analyzer, AnalyzerRegistry, parse_analysis_settings
from .tokenizers import standard_tokenize, ngram_tokenize, Token
from .ngram_generator import Edge, ngram_generate
from .filters import lowercase_filter, ascii_fold, ascii_folding_filter, ngram_filter
from .html_strip import html_to_text

__all__ = [
    "Analyzer", "AnalyzerRegistry", "parse_analysis_settings",
    "standard_tokenize", "ngram_tokenize", "Token",
    "Edge", "ngram_generate",
    "lowercase_filter", "ascii_fold", "ascii_folding_filter", "ngram_filter",
    "html_to_text",
]
