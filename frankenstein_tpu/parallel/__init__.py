from frankenstein_tpu.parallel import mesh as mesh
from frankenstein_tpu.parallel import pipeline as pipeline
from frankenstein_tpu.parallel import ring_attention as ring_attention
from frankenstein_tpu.parallel import sharding as sharding
