"""HF Llama -> FlashLM conversion parity.

A randomly-initialized tiny ``transformers`` Llama and the converted
FlashLM params must produce the same logits — this pins the RoPE
half-split -> interleaved channel permutation, the projection
transposes, and the RMSNorm/SwiGLU conventions all at once.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from flash_attention_metal_tpu.models import forward  # noqa: E402
from flash_attention_metal_tpu.models.convert import (  # noqa: E402
    convert_hf_llama,
)


@pytest.fixture(scope="module")
def hf_model():
    cfg = transformers.LlamaConfig(
        vocab_size=512,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_key_value_heads=1,  # GQA
        max_position_embeddings=512,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        attention_bias=False,
        mlp_bias=False,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg)
    model.eval()
    return model


def test_convert_matches_hf_logits(hf_model):
    cfg, params = convert_hf_llama(hf_model, dtype=jnp.float32)
    assert cfg.n_heads == 2 and cfg.n_kv_heads == 1 and cfg.head_dim == 64

    tokens = np.random.default_rng(1).integers(0, 512, size=(2, 64))
    with torch.no_grad():
        want = hf_model(torch.from_numpy(tokens)).logits.numpy()
    got = np.asarray(
        forward(params, jnp.asarray(tokens, jnp.int32), cfg, remat=False)
    )
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_converted_model_serves(hf_model):
    """The converted checkpoint decodes greedily == HF greedy."""
    from flash_attention_metal_tpu.runtime.engine import (
        DecodeEngine,
        Request,
    )

    cfg, params = convert_hf_llama(hf_model, dtype=jnp.float32)
    prompt = [3, 17, 256, 9]
    n_new = 6

    with torch.no_grad():
        out = hf_model.generate(
            torch.tensor([prompt]),
            max_new_tokens=n_new,
            do_sample=False,
            num_beams=1,
            pad_token_id=0,
        )
    want = out[0, len(prompt):].tolist()

    eng = DecodeEngine(params, cfg, max_batch=1, max_len=128)
    eng.submit(Request(uid=0, prompt=prompt, max_new_tokens=n_new))
    got = eng.run()[0]
    assert got == want, (got, want)


def test_convert_tied_embeddings():
    cfg = transformers.LlamaConfig(
        vocab_size=256,
        hidden_size=128,
        intermediate_size=128,
        num_hidden_layers=1,
        num_attention_heads=2,
        num_key_value_heads=2,
        max_position_embeddings=256,
        tie_word_embeddings=True,
    )
    torch.manual_seed(1)
    model = transformers.LlamaForCausalLM(cfg)
    model.eval()
    mcfg, params = convert_hf_llama(model, dtype=jnp.float32)
    tokens = np.arange(8)[None, :]
    with torch.no_grad():
        want = model(torch.from_numpy(tokens)).logits.numpy()
    got = np.asarray(
        forward(params, jnp.asarray(tokens, jnp.int32), mcfg, remat=False)
    )
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)
