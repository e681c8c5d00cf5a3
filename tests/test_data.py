"""Data layer: augmentation alignment, dataset semantics, loader, config."""

import os

import numpy as np
import pytest
from PIL import Image

from hvi_cidnet_tpu.data.datasets import (
    EvalDataset,
    PairedFolderDataset,
    SceneFolderDataset,
)
from hvi_cidnet_tpu.data.pipeline import TrainLoader
from hvi_cidnet_tpu.data.transforms import (
    pad_to_multiple,
    paired_random_crop_flip,
    to_float01,
)
from hvi_cidnet_tpu.utils.config import option, selected_dataset, str2bool


def _write_img(path, arr):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr.astype(np.uint8)).save(path)


def _make_pair_tree(root, n=4, size=(40, 60)):
    rng = np.random.default_rng(0)
    for i in range(n):
        img = rng.integers(0, 255, (*size, 3))
        _write_img(f"{root}/low/{i:03d}.png", img // 3)
        _write_img(f"{root}/high/{i:03d}.png", img)


def test_paired_crop_is_aligned():
    rng = np.random.default_rng(1)
    base = rng.integers(0, 255, (50, 70, 3)).astype(np.uint8)
    a, b = paired_random_crop_flip(base, base.copy(), 32, np.random.default_rng(2))
    np.testing.assert_array_equal(a, b)  # identical transform on the pair
    assert a.shape == (32, 32, 3)


def test_crop_smaller_than_image_raises():
    img = np.zeros((16, 16, 3), np.uint8)
    with pytest.raises(ValueError):
        paired_random_crop_flip(img, img, 32, np.random.default_rng(0))


def test_pad_to_multiple_matches_reference_rule():
    """Dims already divisible by 8 stay; others pad UP (eval_sets.py:23-28)."""
    img = np.zeros((400, 600, 3), np.float32)
    out, h, w = pad_to_multiple(img, 8)
    assert out.shape == (400, 600, 3) and (h, w) == (400, 600)
    img2 = np.zeros((37, 61, 3), np.float32)
    out2, h2, w2 = pad_to_multiple(img2, 8)
    assert out2.shape == (40, 64, 3) and (h2, w2) == (37, 61)


def test_paired_folder_dataset(tmp_path):
    root = str(tmp_path / "lol")
    _make_pair_tree(root)
    ds = PairedFolderDataset(root + "/low", root + "/high", crop_size=32, length=485)
    assert len(ds) == 485  # reference epoch-length override (LOLdataset.py:43)
    low, high = ds.sample(3, np.random.default_rng(0))
    assert low.shape == (32, 32, 3) and high.shape == (32, 32, 3)
    assert low.dtype == np.float32 and low.max() <= 1.0


def test_scene_folder_dataset_blur(tmp_path):
    root = str(tmp_path / "blur")
    rng = np.random.default_rng(3)
    # populate only scenes 3 and 7: the sampler must skip missing folders
    for scene in (3, 7):
        name = str(scene + 1).zfill(4)
        for frame in range(2):
            img = rng.integers(0, 255, (40, 48, 3))
            _write_img(f"{root}/low_blur/{name}/{frame}.png", img // 2)
            _write_img(f"{root}/high_sharp_scaled/{name}/{frame}.png", img)
    ds = SceneFolderDataset(root, "blur", crop_size=32)
    assert len(ds) == 10200  # virtual epoch length (SICE_blur_SID.py:49)
    low, high = ds.sample(12345, np.random.default_rng(4))  # index ignored
    assert low.shape == (32, 32, 3)


def test_eval_dataset_pad_and_names(tmp_path):
    d = str(tmp_path / "eval")
    _write_img(f"{d}/b.png", np.zeros((37, 61, 3)))
    _write_img(f"{d}/a.png", np.zeros((40, 64, 3)))
    ds = EvalDataset(d, pad=True)
    img, name, h, w = ds[0]
    assert name == "a.png" and img.shape == (40, 64, 3)  # sorted order
    img2, name2, h2, w2 = ds[1]
    assert name2 == "b.png" and img2.shape == (40, 64, 3) and (h2, w2) == (37, 61)
    ds2 = EvalDataset(d, pad=False)
    assert len(ds2[0]) == 2


def test_train_loader_epoch(tmp_path):
    root = str(tmp_path / "lol2")
    _make_pair_tree(root, n=6)
    ds = PairedFolderDataset(root + "/low", root + "/high", crop_size=16)
    loader = TrainLoader(ds, batch_size=2, seed=0, num_threads=2)
    batches = list(loader.epoch())
    assert len(batches) == loader.steps_per_epoch == 3
    low, high = batches[0]
    assert low.shape == (2, 16, 16, 3)


def test_config_selector_and_bools():
    opt = option().parse_args(["--lol_v1", "true", "--lmot", "false"])
    assert selected_dataset(opt) == "lol_v1"
    opt2 = option().parse_args([])  # fork default: lmot on (options.py:80)
    assert selected_dataset(opt2) == "lmot"
    with pytest.raises(SystemExit):
        selected_dataset(option().parse_args(["--lmot", "false"]))
    with pytest.raises(SystemExit):  # argparse error for a non-boolean string
        option().parse_args(["--gamma", "maybe"])
    assert str2bool("True") and not str2bool("0")


def test_loss_weight_defaults_match_reference():
    opt = option().parse_args([])
    assert (opt.HVI_weight, opt.L1_weight, opt.D_weight, opt.E_weight, opt.P_weight) == (
        1.0, 1.0, 0.5, 50.0, 0.01,
    )  # options.py:56-61
    assert (opt.start_gamma, opt.end_gamma) == (60, 120)  # options.py:65-66


def test_multihost_loader_single_process_matches_plain(tmp_path):
    """MultiHostTrainLoader with process_count=1 yields the same batches as
    TrainLoader (same seed/stream) but as GLOBAL mesh-sharded jax.Arrays
    (SURVEY.md §2.3 item 2)."""
    import jax
    from jax.sharding import PartitionSpec as P

    from hvi_cidnet_tpu.parallel.mesh import make_mesh
    from hvi_cidnet_tpu.parallel.multihost import MultiHostTrainLoader

    root = str(tmp_path / "mh")
    _make_pair_tree(root, n=16)
    ds = PairedFolderDataset(root + "/low", root + "/high", crop_size=16)
    mesh = make_mesh(axis_names=("data",))

    plain = TrainLoader(ds, batch_size=8, seed=3, num_threads=2)
    multi = MultiHostTrainLoader(ds, 8, mesh=mesh, seed=3, num_threads=2)
    for (l1, h1), (l2, h2) in zip(plain.epoch(), multi.epoch()):
        assert l2.sharding.spec == P("data")
        assert l2.shape == (8, 16, 16, 3)
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
        np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    plain.close()
    multi.close()


def test_multihost_process_slices_partition_the_batch(tmp_path):
    """Simulated 4-process decode: per-process slices are disjoint, cover the
    global batch, and reproduce exactly the rows the single-process loader
    would have produced (shared rng stream)."""
    from hvi_cidnet_tpu.parallel.mesh import make_mesh
    from hvi_cidnet_tpu.parallel.multihost import (
        MultiHostTrainLoader,
        process_local_slice,
    )

    slices = [process_local_slice(8, process_index=p, process_count=4) for p in range(4)]
    covered = sorted(i for s in slices for i in range(8)[s])
    assert covered == list(range(8))

    root = str(tmp_path / "mh4")
    _make_pair_tree(root, n=16)
    ds = PairedFolderDataset(root + "/low", root + "/high", crop_size=16)
    mesh = make_mesh(axis_names=("data",))

    ref = TrainLoader(ds, batch_size=8, seed=7, num_threads=2)
    ref_low, ref_high = next(iter(ref.epoch()))
    ref.close()

    parts_low = []
    for p in range(4):
        lo = MultiHostTrainLoader(
            ds, 8, mesh=mesh, seed=7, num_threads=2,
            process_index=p, process_count=4,
        )
        order = lo._inner._rng.permutation(len(ds))
        low_p, _ = lo._inner._make_batch(order[:8])  # batch_rows slices to p's rows
        parts_low.append(low_p)
        lo.close()
    np.testing.assert_array_equal(np.concatenate(parts_low), np.asarray(ref_low))


def test_sharding_local_slice_follows_device_map():
    """ADVICE r3: the loader's row slice must come from the sharding's
    actual device→index map, not an assumed process order.  On the 8-fake-
    device single-process mesh all rows are local; with a simulated foreign
    process index the derivation must reject (no rows owned)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from hvi_cidnet_tpu.parallel.mesh import make_mesh
    from hvi_cidnet_tpu.parallel.multihost import sharding_local_slice

    mesh = make_mesh(axis_names=("data",))
    sh = NamedSharding(mesh, P("data"))
    assert sharding_local_slice(sh, 16) == slice(0, 16)
    with pytest.raises(ValueError, match="owns no rows"):
        sharding_local_slice(sh, 16, process_index=3)


def test_initialize_distributed_reraises_real_failures(monkeypatch):
    """ADVICE r3: only the already-initialized case may be swallowed —
    a genuine launch failure (unreachable coordinator) must propagate."""
    import jax

    from hvi_cidnet_tpu.parallel import multihost

    def boom(**kwargs):
        raise RuntimeError("Unable to connect to coordinator at 10.0.0.1:1234")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: False)
    with pytest.raises(RuntimeError, match="coordinator"):
        multihost.initialize_distributed()

    # the already-initialized message IS swallowed
    def already(**kwargs):
        raise RuntimeError("Distributed system is already initialized")

    monkeypatch.setattr(jax.distributed, "initialize", already)
    multihost.initialize_distributed()  # no raise
    # and a live runtime short-circuits before calling initialize at all
    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: True)
    monkeypatch.setattr(jax.distributed, "initialize", boom)
    multihost.initialize_distributed()  # no raise


def test_loader_resamples_dataset_smaller_than_batch(tmp_path):
    """A dataset smaller than one batch wraps around to a FULL batch: the
    jitted step needs static shapes, and the multi-host loader needs every
    process slice populated (a 485-pair set at pod-scale global batches
    would otherwise hand processes unequal shard shapes)."""
    from jax.sharding import PartitionSpec as P

    from hvi_cidnet_tpu.parallel.mesh import make_mesh
    from hvi_cidnet_tpu.parallel.multihost import MultiHostTrainLoader

    root = str(tmp_path / "tiny")
    _make_pair_tree(root, n=3)
    ds = PairedFolderDataset(root + "/low", root + "/high", crop_size=16)

    loader = TrainLoader(ds, batch_size=8, seed=0, num_threads=2)
    batches = list(loader.epoch())
    assert len(batches) == loader.steps_per_epoch == 1
    assert batches[0][0].shape == (8, 16, 16, 3)
    loader.close()

    mesh = make_mesh(axis_names=("data",))
    multi = MultiHostTrainLoader(ds, 8, mesh=mesh, seed=0, num_threads=2)
    glow, ghigh = next(iter(multi.epoch()))
    assert glow.shape == (8, 16, 16, 3) and ghigh.shape == (8, 16, 16, 3)
    assert glow.sharding.spec == P("data")
    multi.close()


def test_image_size_honors_exif_orientation(tmp_path):
    """cv2's decoder auto-rotates EXIF orientations; the header-only size
    probe must predict the DECODED shape or streaming-eval bucket planning
    crashes on rotated phone JPEGs (code-review r4 finding)."""
    from PIL import Image as PILImage

    from hvi_cidnet_tpu.data.datasets import image_size, load_image

    rng = np.random.default_rng(3)
    img = PILImage.fromarray(rng.integers(0, 255, (40, 56, 3)).astype(np.uint8))
    ex = PILImage.Exif()
    ex[0x0112] = 6  # 90-degree rotation: decoded shape transposes
    p = tmp_path / "rot.jpg"
    img.save(p, exif=ex)
    assert image_size(str(p)) == load_image(str(p)).shape[:2] == (56, 40)
