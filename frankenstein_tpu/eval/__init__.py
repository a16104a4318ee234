from frankenstein_tpu.eval import wer as wer
from frankenstein_tpu.eval import submission as submission
