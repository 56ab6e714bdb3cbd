from .textutil import tokenize, is_stopword, filter_terms, STOPWORDS
from .envloader import load_env_file
