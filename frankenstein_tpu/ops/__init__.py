from frankenstein_tpu.ops import attention as attention
from frankenstein_tpu.ops import masks as masks
from frankenstein_tpu.ops import norms as norms
from frankenstein_tpu.ops import rope as rope
