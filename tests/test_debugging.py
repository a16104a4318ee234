"""Numerics guards + trainer auto-resume."""

import numpy as np
import jax.numpy as jnp
import pytest

from frankenstein_tpu.utils import debugging


def test_assert_finite_tree():
    debugging.assert_finite_tree({"a": jnp.ones(3)}, "ok")
    with pytest.raises(FloatingPointError, match="a/b"):
        debugging.assert_finite_tree(
            {"a": {"b": jnp.asarray([1.0, np.nan])}}, "bad")


def test_jit_eager_parity():
    debugging.jit_eager_parity(lambda x: {"y": jnp.sin(x) * 2}, jnp.ones(4))
    with pytest.raises(AssertionError):
        # a function whose jit output we fake-diverge via side test
        import jax
        calls = []

        def f(x):
            calls.append(1)
            return x + len(calls)  # impure: differs between traces

        debugging.jit_eager_parity(f, jnp.zeros(2))


@pytest.mark.slow
def test_trainer_resume(tmp_path):
    import jax
    from frankenstein_tpu.config import TrainConfig, VQVAEConfig
    from frankenstein_tpu.data import datasets, tokenizers
    from frankenstein_tpu.models.vq_brain import SoundStream
    from frankenstein_tpu.train import trainer

    tok = tokenizers.ByteTokenizer(eot_id=63)
    ds = datasets.BrainDataset.synthetic(
        n_trials=16, tokenize_function=tokenizers.get_tokenizer(tok),
        n_electrodes=8, max_input_len=16, max_tokens=4)
    cfg_vq = VQVAEConfig(n_electrodes=8, C=8, D=4, codebook_size=16)
    spec = trainer.TrainableSpec(module=SoundStream(cfg_vq),
                                 rng_names=("vq",), mutable=("vq",),
                                 needs_train_flag=True, needs_labels=False)
    tcfg = TrainConfig(exp_name="r", batch_size=8, max_steps=4,
                       eval_interval=2, learning_rate=1e-3, warmup_iters=0,
                       use_scheduler=False)
    s1 = trainer.run_train_model(spec, (ds, ds), tcfg, save_folder=tmp_path)
    # resume continues from the saved step, not zero
    s2 = trainer.run_train_model(spec, (ds, ds), tcfg.replace(max_steps=6),
                                 save_folder=tmp_path, resume=True)
    assert int(s2.step) > int(s1.step) - 2
