from frankenstein_tpu.parallel import mesh as mesh
