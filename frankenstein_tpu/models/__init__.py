from frankenstein_tpu.models import layers as layers
