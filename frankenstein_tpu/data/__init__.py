from frankenstein_tpu.data import text as text
from frankenstein_tpu.data import tokenizers as tokenizers
from frankenstein_tpu.data import datasets as datasets
