from frankenstein_tpu.decode import sampling as sampling
