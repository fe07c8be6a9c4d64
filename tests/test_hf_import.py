"""HF checkpoint interop: logit parity against torch LlamaForCausalLM."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402

from pdec.models.hf_import import (  # noqa: E402
    config_from_hf,
    load_hf_checkpoint,
    params_from_state_dict,
    state_dict_from_params,
)
from pdec.models.transformer import forward  # noqa: E402


@pytest.fixture(scope="module")
def hf_model():
    cfg = transformers.LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        rope_theta=10000.0,
        rms_norm_eps=1e-6,
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg)
    model.eval()
    return cfg, model


def test_logit_parity_with_torch(hf_model):
    hf_cfg, model = hf_model
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    cfg = config_from_hf(hf_cfg.to_dict())
    params = params_from_state_dict(state, cfg, dtype="float32")

    tokens = np.array([[3, 17, 42, 99, 5, 64, 23, 8]], dtype=np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(tokens.astype(np.int64))).logits.numpy()
    ours, _ = forward(params, tokens, cfg)
    ours = np.asarray(ours)
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=2e-3)


def test_state_dict_roundtrip(hf_model):
    hf_cfg, model = hf_model
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    cfg = config_from_hf(hf_cfg.to_dict())
    params = params_from_state_dict(state, cfg, dtype="float32")
    back = state_dict_from_params(params, cfg)
    for key, val in back.items():
        np.testing.assert_allclose(val, state[key], atol=1e-6)


def test_load_from_directory(hf_model, tmp_path):
    _, model = hf_model
    model.save_pretrained(str(tmp_path), safe_serialization=True)
    cfg, params = load_hf_checkpoint(str(tmp_path), dtype="float32")
    assert cfg.n_layers == 2
    tokens = np.array([[1, 2, 3, 4]], dtype=np.int32)
    logits, _ = forward(params, tokens, cfg)
    with torch.no_grad():
        ref = model(torch.tensor(tokens.astype(np.int64))).logits.numpy()
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-3, rtol=2e-3)
