from frankenstein_tpu.train import schedule as schedule
from frankenstein_tpu.train import trainer as trainer
