"""Workload driver smoke tests (CLI mains with synthetic data) + inject
context + profiling helpers."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.slow
def test_deit_eval_main_synthetic(capsys):
    from mx_quantization_tpu.workloads.deit import main
    stats = main(["--model", "deit_tiny_patch16_224", "--batch-size", "8",
                  "--mx-quant", "--top-k", "--k", "16",
                  "--engine", "ref"])
    assert 0.0 <= stats["acc1"] <= 1.0 and stats["n"] == 8


@pytest.mark.slow
def test_dit_sample_main_synthetic(tmp_path):
    from mx_quantization_tpu.workloads.dit import main
    out = str(tmp_path / "s.npz")
    main(["--model", "DiT-debug", "--image-size", "64", "--num-steps", "2",
          "--classes", "1", "2", "--out", out, "--mx-quant", "--top-k",
          "--k", "4", "--engine", "ref", "--exclude-blocks", "1"])
    z = np.load(out)
    assert z["latents"].shape == (2, 4, 8, 8)


@pytest.mark.slow
def test_dit_train_smoke():
    from mx_quantization_tpu.workloads.dit_train import main
    # batch must divide over the data mesh axis (8 virtual devices in tests)
    main(["--model", "DiT-debug", "--steps", "3", "--batch", "8",
          "--image-size", "32"])


@pytest.mark.slow
def test_pixart_main_synthetic(tmp_path):
    from mx_quantization_tpu.workloads.pixart import main
    out = str(tmp_path / "p.npz")
    main(["--image-size", "32", "--num-steps", "2", "--out", out,
          "--num-layers", "2", "--num-heads", "2", "--head-dim", "32",
          "--caption-channels", "64", "--mx-quant", "--self-top-k",
          "--self-k", "4", "--prompts", "a cat", "--engine", "ref"])
    assert os.path.exists(out)


@pytest.mark.slow
def test_pixart_main_sigma_variant(tmp_path):
    """Sigma driver: 300-token captions, micro-conds off
    (text_local_inference_sigma.py operating point, scaled down)."""
    from mx_quantization_tpu.workloads.pixart import main
    out = str(tmp_path / "s.npz")
    main(["--variant", "sigma", "--image-size", "32", "--num-steps", "2",
          "--out", out, "--num-layers", "2", "--num-heads", "2",
          "--head-dim", "32", "--caption-channels", "64",
          "--max-token-length", "16", "--mx-quant", "--self-top-k",
          "--self-k", "4", "--prompts", "a dog", "--engine", "ref"])
    assert os.path.exists(out)


def test_inject_context():
    from mx_quantization_tpu import finalize_mx_specs
    from mx_quantization_tpu.inject import linear, quantized
    specs = finalize_mx_specs(dict(w_elem_format="int8",
                                   a_elem_format="int8", scale_bits=8,
                                   block_size=32, quantize_backprop=False))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 64).astype(np.float32))
    w = jnp.asarray(rng.randn(8, 64).astype(np.float32))
    plain = linear(x, w)
    with quantized(specs):
        q = linear(x, w)
    assert not np.allclose(np.asarray(plain), np.asarray(q))
    # explicit specs win over ambient
    with quantized(specs):
        p2 = linear(x, w, mx_specs=None)  # ambient applies
        assert np.allclose(np.asarray(p2), np.asarray(q))


def test_roofline_helper():
    from mx_quantization_tpu.utils.profiling import matmul_roofline
    r = matmul_roofline(4096, 4096, 4096)
    assert r["bound"] == "compute"
    r2 = matmul_roofline(16, 16, 16)
    assert r2["bound"] == "memory"


def test_deit_train_smoke():
    from mx_quantization_tpu.workloads.deit_train import main
    main(["--model", "deit_tiny_patch16_224", "--steps", "3", "--batch",
          "8", "--img-size", "32"])


def test_fid_sharded_resume():
    from mx_quantization_tpu.models import DiT_models, DiTQuantConfig, init_dit
    from mx_quantization_tpu.workloads.dit import sample_for_fid
    cfg = DiT_models["DiT-debug"](input_size=8, num_classes=10)
    params = init_dit(jax.random.key(0), cfg)
    qcfg = DiTQuantConfig()
    # two ranks cover disjoint shards; resume skips
    a = sample_for_fid(params, cfg, qcfg, num_samples=4, batch=2,
                       key=jax.random.key(1), rank=0, world=2, num_steps=2)
    b = sample_for_fid(params, cfg, qcfg, num_samples=4, batch=2,
                       key=jax.random.key(1), rank=1, world=2, num_steps=2)
    assert a.shape == (2, 4, 8, 8) and b.shape == (2, 4, 8, 8)
    c = sample_for_fid(params, cfg, qcfg, num_samples=4, batch=2,
                       key=jax.random.key(1), rank=0, world=2, num_steps=2,
                       start_index=1)
    assert c.shape == (1, 4, 8, 8)


@pytest.mark.slow
def test_deit_anal_mode(tmp_path, capsys):
    """--anal writes per-block predictor-quality records (reference deit
    main.py --anal + funcs/analysis.py:136-157)."""
    from mx_quantization_tpu.workloads.deit import main
    adir = str(tmp_path / "anal")
    main(["--model", "deit_tiny_patch16_224", "--batch-size", "4",
          "--mx-quant", "--top-k", "--k", "16", "--engine", "ref",
          "--anal", "--anal-dir", adir])
    path = os.path.join(adir, "topk_analysis.jsonl")
    recs = [json.loads(l) for l in open(path)]
    # blocks 0..10 run top-k; block 11 is always dense (reference rule)
    assert [r["block"] for r in recs] == list(range(11))
    assert all(0.0 < r["softmax_recall"] <= 1.5 for r in recs)
    assert all(16 <= r["avg_chosen_k"] <= 197 for r in recs)


@pytest.mark.slow
def test_dit_anal_mode(tmp_path):
    """--anal during sampling writes per-(timestep, block) records."""
    from mx_quantization_tpu.workloads.dit import main
    adir = str(tmp_path / "anal")
    out = str(tmp_path / "s.npz")
    main(["--model", "DiT-debug", "--image-size", "64", "--num-steps", "2",
          "--classes", "1", "--out", out, "--mx-quant", "--top-k",
          "--k", "4", "--engine", "ref", "--exclude-blocks", "1",
          "--anal", "--anal-dir", adir])
    path = os.path.join(adir, "topk_analysis.jsonl")
    recs = [json.loads(l) for l in open(path)]
    # 2 timesteps x 1 top-k block (block 1 excluded of the 2-block debug)
    assert len(recs) == 2
    assert {r["timestep_idx"] for r in recs} == {0, 1}
    assert all(r["block"] == 0 for r in recs)


@pytest.mark.slow
def test_inject_full_surface():
    """The ambient-context wrapper surface mirrors the reference's
    MODULE_MAPPING + FUNCTION_MAPPING union (mx_mapping.py:68-122)."""
    import jax
    import jax.numpy as jnp
    from mx_quantization_tpu import finalize_mx_specs, inject
    from mx_quantization_tpu.ops.batchnorm import init_batchnorm_state

    specs = finalize_mx_specs(dict(w_elem_format="int8",
                                   a_elem_format="int8", scale_bits=8,
                                   block_size=32, bfloat=16,
                                   quantize_backprop=False))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 32).astype(np.float32))
    img = jnp.asarray(rng.randn(2, 3, 16, 16).astype(np.float32))
    w1 = jnp.asarray(rng.randn(8, 3, 3, 3).astype(np.float32))
    g = jnp.ones((32,)); b = jnp.zeros((32,))

    with inject.quantized(specs):
        assert inject.relu(x).shape == x.shape
        assert inject.relu6(x).shape == x.shape
        assert inject.leaky_relu(x).shape == x.shape
        assert inject.sigmoid(x).shape == x.shape
        assert inject.silu(x).shape == x.shape
        assert inject.tanh(x).shape == x.shape
        assert inject.bmm(jnp.ones((2, 4, 8)), jnp.ones((2, 8, 4))
                          ).shape == (2, 4, 4)
        assert inject.addmm(jnp.zeros((4,)), x, jnp.ones((32, 4))
                            ).shape == (4, 4)
        assert inject.conv2d(img, w1, stride=1, padding=1
                             ).shape == (2, 8, 16, 16)
        assert inject.layer_norm(x, g, b).shape == x.shape
        assert inject.rms_norm(x, g, b).shape == x.shape
        assert inject.group_norm(img, jnp.ones((3,)), jnp.zeros((3,)),
                                 num_groups=3).shape == img.shape
        st = init_batchnorm_state(3)
        out, _ = inject.batch_norm(img, st, jnp.ones((3,)), jnp.zeros((3,)))
        assert out.shape == img.shape
        assert inject.adaptive_avg_pool2d(img, (4, 4)).shape == (2, 3, 4, 4)
        assert inject.add(x, x).shape == x.shape
        assert inject.sub(x, x).shape == x.shape
        assert inject.mul(x, x).shape == x.shape
        assert inject.div(x, 1.0 + x * 0 + 1.0).shape == x.shape
        assert inject.exp(x).shape == x.shape
        assert inject.log(jnp.abs(x) + 1.0).shape == x.shape
        assert inject.square(x).shape == x.shape
        assert inject.sum(x, -1).shape == (4,)
        assert inject.mean(x, -1).shape == (4,)
        assert inject.norm(x).shape == ()
        a1, a2 = inject.split(x)
        assert a1.shape == x.shape and a2.shape == x.shape
        assert inject.quantize(x).shape == x.shape
    # outside the context, no-specs falls back to exact math
    np.testing.assert_allclose(np.asarray(inject.relu(x)),
                               np.asarray(jax.nn.relu(x)))


def test_parse_trace(tmp_path):
    """parse_trace sums device-event durations from a profiler trace dir."""
    import gzip
    import json as _json
    from mx_quantization_tpu.utils.profiling import parse_trace
    d = tmp_path / "plugins" / "profile"
    d.mkdir(parents=True)
    events = {"traceEvents": [
        {"ph": "X", "name": "fusion.1", "dur": 10},
        {"ph": "X", "name": "fusion.1", "dur": 5},
        {"ph": "X", "name": "matmul", "dur": 30},
        {"ph": "M", "name": "meta", "dur": 99},
    ]}
    with gzip.open(d / "host.trace.json.gz", "wt") as f:
        _json.dump(events, f)
    out = parse_trace(str(tmp_path))
    assert out == {"matmul": 30, "fusion.1": 15}
    assert list(out) == ["matmul", "fusion.1"]  # descending
    assert parse_trace(str(tmp_path), top=1) == {"matmul": 30}


def test_checkpoint_auto_download_paths(tmp_path, monkeypatch):
    """find_model auto-download (reference download.py:18-43): canonical
    names fetch from the release URL into $DIT_CKPT_DIR (urllib mocked —
    no network in this environment); a failing fetch raises OSError with
    the manual-retrieval URL; unknown names raise FileNotFoundError."""
    import io
    import os
    import pytest
    import torch
    from mx_quantization_tpu.utils import checkpoint as ck

    monkeypatch.setenv("DIT_CKPT_DIR", str(tmp_path))

    # build a tiny valid checkpoint the mocked download will deliver
    from tests.make_golden_model import MODEL_KW  # debug-scale dims
    sd_src = os.path.join(os.path.dirname(__file__), "golden",
                          "dit_model_sd.pt")
    payload = open(sd_src, "rb").read()

    def fake_retrieve(url, dst):
        assert url.startswith("https://dl.fbaipublicfiles.com/DiT/models/")
        with open(dst, "wb") as f:
            f.write(payload)

    import urllib.request
    monkeypatch.setattr(urllib.request, "urlretrieve", fake_retrieve)
    params = ck.find_model("DiT-XL-2-256x256.pt", depth=2)
    assert "blocks" in params
    # cached now: a second resolve must not re-download
    monkeypatch.setattr(urllib.request, "urlretrieve",
                        lambda *a: (_ for _ in ()).throw(AssertionError))
    params2 = ck.find_model("DiT-XL-2-256x256.pt", depth=2)
    assert "blocks" in params2

    # failing fetch -> OSError with the URL; no partial file left behind
    def fail_retrieve(url, dst):
        raise OSError("no route to host")
    monkeypatch.setattr(urllib.request, "urlretrieve", fail_retrieve)
    with pytest.raises(OSError, match="dl.fbaipublicfiles.com"):
        ck.download_model("DiT-XL-2-512x512.pt")
    assert not os.path.exists(tmp_path / "DiT-XL-2-512x512.pt.part")

    with pytest.raises(FileNotFoundError):
        ck.find_model("not-a-model.pt", depth=2)
