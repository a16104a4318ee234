from frankenstein_tpu.utils import metrics as metrics
from frankenstein_tpu.utils import profiling as profiling
