"""Int8 eval-quantization mechanics.

Validates quantization error bounds and that the quantized backbone's
embeddings stay directionally faithful to the f32 path on a tiny model
(real-weight retrieval parity is a TODO for when released weights are
available).
"""

import numpy as np
import jax
import jax.numpy as jnp

from helping_hand_for_egocentric_videos_tpu.models import (
    SpaceTimeConfig,
    init_spacetime_params,
    spacetime_forward,
)
from helping_hand_for_egocentric_videos_tpu.models.quant import (
    int8_linear,
    quantize_lavila_params,
    quantize_linear_params,
)


def test_int8_linear_error_bound(rng):
    d_in, d_out, n = 64, 32, 16
    w = rng.normal(size=(d_in, d_out)).astype(np.float32) * 0.05
    b = rng.normal(size=(d_out,)).astype(np.float32) * 0.01
    x = rng.normal(size=(n, d_in)).astype(np.float32)
    qp = quantize_linear_params({"w": jnp.asarray(w), "b": jnp.asarray(b)})
    assert qp["w_q"].dtype == jnp.int8
    y_q = np.asarray(int8_linear(qp, jnp.asarray(x)))
    y = x @ w + b
    rel = np.linalg.norm(y_q - y) / np.linalg.norm(y)
    assert rel < 0.02, rel  # ~1% relative error for int8 symmetric quant


def test_quantized_backbone_embeddings_close(rng):
    cfg = SpaceTimeConfig(img_size=28, patch_size=14, width=64, depth=2, heads=4, num_frames=2)
    params = init_spacetime_params(jax.random.PRNGKey(0), cfg)
    qparams = quantize_lavila_params({"visual": params})["visual"]
    assert qparams["blocks"]["attn"]["qkv"]["w_q"].dtype == jnp.int8
    assert qparams["blocks"]["mlp_fc1"]["w_q"].shape == (2, 64, 256)

    video = jnp.asarray(rng.normal(size=(2, 2, 28, 28, 3)).astype(np.float32))
    cls_f, tok_f = spacetime_forward(params, cfg, video, use_remat=False, dtype=jnp.float32)
    cls_q, tok_q = spacetime_forward(qparams, cfg, video, use_remat=False, dtype=jnp.float32)

    def cos(a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        return (a * b).sum(-1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))

    c = cos(cls_f, cls_q)
    assert (c > 0.99).all(), c
    ct = cos(tok_f.reshape(-1, 64), tok_q.reshape(-1, 64))
    assert np.mean(ct) > 0.98, np.mean(ct)
