"""End-to-end eval protocol: synthetic Middlebury scene -> fetch_dataset ->
Evaluator (pad-32, mono normalize, metrics, CSV) with a real (random-init)
model — the full test.py-equivalent path (reference test.py:160-274)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stereoanywhere_tpu.data import fetch_dataset
from stereoanywhere_tpu.data.frame_utils import write_pfm
from stereoanywhere_tpu.eval.harness import Evaluator


def _png(path, arr):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


@pytest.mark.slow
def test_evaluator_end_to_end(tmp_path, rng):
    # synthetic scene: 40x64, known gt
    root = str(tmp_path / "data")
    scene = f"{root}/sceneA"
    _png(f"{scene}/im0.png", rng.integers(0, 255, (40, 64, 3)).astype(np.uint8))
    _png(f"{scene}/im1.png", rng.integers(0, 255, (40, 64, 3)).astype(np.uint8))
    gt = rng.uniform(1, 12, (40, 64)).astype(np.float32)
    write_pfm(f"{scene}/disp0GT.pfm", gt)
    _png(f"{scene}/mask0nocc.png", np.full((40, 64), 255, np.uint8))
    ds = fetch_dataset("middlebury", root, test=True)

    from stereoanywhere_tpu.config import StereoAnywhereConfig
    from stereoanywhere_tpu.models import StereoAnywhere

    model = StereoAnywhere(StereoAnywhereConfig())
    dummy = tuple(jnp.zeros((1, 32, 64, c), jnp.float32) for c in (3, 3, 1, 1))
    variables = jax.jit(lambda k: model.init(k, *dummy, iters=1, test_mode=True))(
        jax.random.PRNGKey(0)
    )

    @jax.jit
    def stereo_fn(im2, im3, m2, m3):
        return model.apply(variables, im2, im3, m2, m3, iters=2, test_mode=True)[
            "disparity"
        ]

    def mono_fn(images01, dataset):
        # stand-in VFM: inverse-luma "depth" (shape/protocol identical)
        return 1.0 - images01.mean(axis=-1, keepdims=True)

    imgdir = str(tmp_path / "imgs")
    ev = Evaluator(
        stereo_fn, mono_fn=mono_fn, dataset_name="middlebury", save_images_dir=imgdir
    )
    res = ev.run(ds)
    means = res.mean()
    for key in ("bad 2.0", "avgerr", "rms"):
        assert key in means, sorted(means)
        assert np.isfinite(means[key])

    # qualitative dumps (reference test.py:298-334): one PNG per panel
    dumped = sorted(os.listdir(imgdir))
    for panel in ("left", "dmap", "gt", "maemap", "metricmap", "mono"):
        assert any(panel in f for f in dumped), (panel, dumped)

    csv_path = str(tmp_path / "out.csv")
    res.to_csv(csv_path, extra_cols={"dataset": "middlebury", "iters": 2})
    text = open(csv_path).read()
    assert "avgerr" in text and "middlebury" in text


def test_evaluator_iscale_path(tmp_path, rng):
    """iscale=2 downscales inputs and rescales the disparity back by the
    width ratio (reference test.py:169-176, 229-240)."""
    root = str(tmp_path / "data")
    scene = f"{root}/sceneB"
    _png(f"{scene}/im0.png", rng.integers(0, 255, (64, 96, 3)).astype(np.uint8))
    _png(f"{scene}/im1.png", rng.integers(0, 255, (64, 96, 3)).astype(np.uint8))
    write_pfm(f"{scene}/disp0GT.pfm", rng.uniform(1, 12, (64, 96)).astype(np.float32))
    _png(f"{scene}/mask0nocc.png", np.full((64, 96), 255, np.uint8))
    ds = fetch_dataset("middlebury", root, test=True)

    seen = {}

    def stereo_fn(im2, im3, m2, m3):
        seen["shape"] = im2.shape
        return jnp.ones(im2.shape[:3] + (1,), jnp.float32) * 4.0

    ev = Evaluator(stereo_fn, mono_fn=lambda x, d: x.mean(-1, keepdims=True),
                   dataset_name="middlebury", iscale=2.0)
    res = ev.run(ds)
    # model saw the half-res input (48 wide, padded to the next 32-multiple)
    assert seen["shape"][1:3] == (32, 64)
    assert np.isfinite(res.mean()["avgerr"])


def test_eval_presets():
    """Shipped per-benchmark scale bundles (reference run_test.py:53-75,
    README.md:323: booster 4, layeredflow 8, others 1)."""
    from stereoanywhere_tpu.eval.harness import eval_preset

    assert eval_preset("booster") == {"iscale": 4.0, "oscale": 4.0}
    assert eval_preset("layeredflow") == {"iscale": 8.0, "oscale": 8.0}
    for ds in ("middlebury", "middlebury2021", "eth3d", "kitti2012", "kitti2015", "monotrap"):
        assert eval_preset(ds) == {"iscale": 1.0, "oscale": 1.0}


def test_shape_bucketer_caps_compiles():
    """Lazy bucket discovery: first max_buckets distinct pad-32 shapes become
    buckets, later misfits grow the least-wasteful bucket by union — the
    compiled-shape count stays capped."""
    from stereoanywhere_tpu.eval.harness import ShapeBucketer

    b = ShapeBucketer(multiple=32, max_buckets=3)
    # widths round to 64 (W/4 % 16 == 0 -> the blocked hourglass's optimal
    # wb=16 split; 12% measured win at the KITTI geometry), heights to 32
    assert b.bucket_for(40, 64) == (64, 64)
    assert b.bucket_for(38, 62) == (64, 64)       # reuses bucket 1
    assert b.bucket_for(72, 96) == (96, 128)      # bucket 2 (width 96 -> 128)
    assert b.bucket_for(130, 200) == (160, 256)   # bucket 3
    # cap reached: a misfit grows a bucket instead of adding a fourth
    got = b.bucket_for(100, 100)
    assert len(b.buckets) == 3
    assert got[0] >= 100 and got[1] >= 100 and got in b.buckets


def test_evaluator_bucketing_compile_count_and_exact_fit(rng):
    """Six distinct image sizes route through <=3 compiled shapes; a sample
    whose pad-32 shape IS its bucket shape produces metrics bit-identical to
    the unbucketed (per-image pad-32) path."""
    from stereoanywhere_tpu.eval.harness import Evaluator, ShapeBucketer

    def make_sample(h, w):
        return {
            "im2": rng.uniform(0, 1, (h, w, 3)).astype(np.float32),
            "im3": rng.uniform(0, 1, (h, w, 3)).astype(np.float32),
            "gt": rng.uniform(1, 12, (h, w, 1)).astype(np.float32),
            "validgt": np.ones((h, w, 1), np.float32),
        }

    shapes_seen = set()

    def stereo_fn(im2, im3, m2, m3):
        shapes_seen.add(im2.shape)
        # deterministic function of the valid content only would need
        # unpadding knowledge; a constant map is enough for metric identity
        return jnp.ones(im2.shape[:3] + (1,), jnp.float32) * 4.0

    mono_fn = lambda x, d: x.mean(-1, keepdims=True)  # noqa: E731

    ev = Evaluator(stereo_fn, mono_fn=mono_fn, dataset_name="middlebury",
                   bucketer=ShapeBucketer(multiple=32, max_buckets=3))
    sizes = [(40, 64), (38, 62), (40, 60), (72, 96), (70, 94), (66, 90)]
    results = [ev.run_sample(make_sample(h, w)) for h, w in sizes]
    assert len(shapes_seen) <= 3, shapes_seen
    assert all(np.isfinite(r["avgerr"]) for r in results)

    # exact-fit sample: bucketed == unbucketed bit-for-bit
    sample = make_sample(40, 64)  # pad-32 shape (64, 64) == its bucket
    ev_b = Evaluator(stereo_fn, mono_fn=mono_fn, dataset_name="middlebury")
    ev_n = Evaluator(stereo_fn, mono_fn=mono_fn, dataset_name="middlebury", bucketer=None)
    m_b = ev_b.run_sample(dict(sample))
    m_n = ev_n.run_sample(dict(sample))
    assert set(m_b) == set(m_n)
    for k in m_b:
        a, c = m_b[k], m_n[k]
        assert (np.isnan(a) and np.isnan(c)) or a == c, (k, a, c)


def test_dav2_sizes_match_reference_protocol():
    """DAV2_SIZES must transcribe reference test.py:192-195 exactly — a
    wrong per-dataset DAv2 inference size silently shifts the mono branch
    and with it every accuracy table (caught three wrong entries in r5:
    middlebury2021 / booster / layeredflow)."""
    from stereoanywhere_tpu.eval.harness import DAV2_SIZES

    width = {"kitti2012": 1372, "kitti2015": 1372, "eth3d": 518,
             "middlebury": 518 * 2, "middlebury2021": 1372,
             "booster": 518 * 2, "layeredflow": 952}
    height = {"kitti2012": 518, "kitti2015": 518, "eth3d": 518,
              "middlebury": 518 * 2, "middlebury2021": 770,
              "booster": 756, "layeredflow": 532}
    for ds in width:
        assert DAV2_SIZES[ds] == (width[ds], height[ds]), ds
