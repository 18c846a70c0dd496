"""--fused --enable_evaluation: the fused single-dispatch pipelines run
the reference's in-loop evaluation (EvaluateFrame + LogMemoryUse,
DynSlam.cpp:154-161) — same CSV files/schema as the staged path, with
the dynamic bucket scored against the instance-COMPOSITED raycast depth
(Evaluation.cpp:93-100)."""

import csv
import glob
import os

import numpy as np
import pytest

from dynslam_tpu.io.synthetic import write_kitti_sequence
from dynslam_tpu.main import main


def _rows_by_frame(csv_dir, pattern, key="frame"):
    files = glob.glob(os.path.join(csv_dir, pattern))
    assert files, f"no CSV matching {pattern} under {csv_dir}"
    with open(files[0]) as f:
        return {int(r[key]): r for r in csv.DictReader(f)}


@pytest.mark.slow
def test_fused_static_eval_matches_staged(tmp_path):
    """The fused static pipeline's eval rows match the staged path's on
    the frames both evaluate (fused has no frame-0 row: frame 0 is the
    bootstrap dispatch). Both paths run the same census depth + VO ops,
    so counts agree up to borderline-pixel rounding."""
    root = str(tmp_path / "seq")
    write_kitti_sequence(root, num_frames=5, width=160, height=120,
                         with_dynamic=False, write_velodyne=True)

    staged_out = str(tmp_path / "staged")
    rc = main([
        "--dataset_root", root, "--out", staged_out, "--tiny",
        "--no-dynamic_mode", "--use_live_stereo", "--enable_evaluation",
        "--max_depth", "8",
    ])
    assert rc == 0
    fused_out = str(tmp_path / "fused")
    rc = main([
        "--dataset_root", root, "--out", fused_out, "--tiny",
        "--no-dynamic_mode", "--fused", "--enable_evaluation",
        "--max_depth", "8",
    ])
    assert rc == 0

    staged = _rows_by_frame(os.path.join(staged_out, "csv"),
                            "*unified-depth-result.csv")
    fused = _rows_by_frame(os.path.join(fused_out, "csv"),
                           "*unified-depth-result.csv")
    # same schema
    any_s = next(iter(staged.values()))
    any_f = next(iter(fused.values()))
    assert list(any_s.keys()) == list(any_f.keys())
    common = sorted(set(staged) & set(fused))
    assert common, "no common evaluated frames"
    assert common == [1, 2, 3, 4]
    for fr in common:
        srow, frow = staged[fr], fused[fr]
        total = max(int(srow["fusion-total-3.00"]), 1)
        for col in srow:
            if col == "frame":
                continue
            diff = abs(int(srow[col]) - int(frow[col]))
            assert diff <= max(5, 0.02 * total), (
                f"frame {fr} col {col}: staged {srow[col]} vs fused "
                f"{frow[col]}"
            )

    # memory CSV: per-frame rows with nonzero usage
    mem = _rows_by_frame(os.path.join(fused_out, "csv"), "*-memory.csv", key="frame_id")
    assert set(mem) == {1, 2, 3, 4}
    assert int(mem[4]["memory_usage_bytes"]) > 0


@pytest.mark.parametrize("lag", [1, 2])
@pytest.mark.slow
def test_fused_dynamic_eval_composited(tmp_path, lag):
    """Fused dynamic eval: the dynamic bucket is scored against the
    composited (instance volumes z-merged) raycast — the fused source
    must have GT-backed coverage at dynamic pixels, which only the
    per-object volumes can provide (the static map has holes there)."""
    import dataclasses

    from dynslam_tpu.config import EvaluationParams
    from dynslam_tpu.ops import depth as depth_ops
    from dynslam_tpu.pipeline.builder import build_fused
    from tests.test_dynamic_pipeline import dynamic_config

    root = str(tmp_path / "seq")
    write_kitti_sequence(root, num_frames=7, width=240, height=160,
                         with_dynamic=True, write_velodyne=True)
    csv_dir = str(tmp_path / f"csv_lag{lag}")
    cfg = dataclasses.replace(
        dynamic_config(),
        evaluation=EvaluationParams(enabled=True, semantic_evaluation=True),
    )
    pipe, input_, segp = build_fused(
        root, cfg, min_detection_size_px=8,
        with_evaluation=True, csv_out_dir=csv_dir,
    )
    assert segp is not None and pipe.evaluation is not None
    pipe.dispatch_lag = lag
    while input_.has_more_images():
        input_.read_next_frame()
        rgb, _ = input_.get_images()
        right_rgb = input_.get_stereo_color()[1]
        lg = np.asarray(depth_ops.rgb_to_gray(rgb))
        rg = np.asarray(depth_ops.rgb_to_gray(right_rgb))
        dets = segp.segment_frame(rgb).instance_detections
        pipe.process_frame(lg, rg, rgb, dets)
    pipe.finalize()
    pipe.evaluation.close()

    uni = _rows_by_frame(csv_dir, "*unified-depth-result.csv")
    dyn = _rows_by_frame(csv_dir, "*dynamic-depth-result.csv")
    sta = _rows_by_frame(csv_dir, "*static-depth-result.csv")
    assert set(uni) == set(dyn) == set(sta)
    assert len(uni) >= 5
    # the car is tracked + reconstructed: dynamic-bucket points exist and
    # the FUSED source covers some of them (composited render)
    tot_dyn = sum(int(r["fusion-total-3.00"]) for r in dyn.values())
    assert tot_dyn > 0, "dynamic bucket empty — routing broken"
    fused_hit = sum(
        int(r["fusion-total-3.00"]) - int(r["fusion-missing-3.00"])
        for r in dyn.values()
    )
    assert fused_hit > 0, (
        "fused source all-missing in the dynamic bucket — instance "
        "compositing not reaching the eval"
    )
    mem = _rows_by_frame(csv_dir, "*-memory.csv", key="frame_id")
    assert len(mem) == len(uni)
    # tracker telemetry: active/reconstructed counts + cumulative drops
    trk = _rows_by_frame(csv_dir, "*-tracker.csv", key="frame_id")
    assert len(trk) == len(uni)
    last = trk[max(trk)]
    assert int(last["active_tracks"]) >= 1
    assert int(last["reconstructed_tracks"]) >= 1
    assert int(last["dropped_detections_cum"]) == 0


def test_fused_eval_failed_fetch_degrades_loudly(tmp_path, monkeypatch,
                                                 capsys):
    """A failing background fetch degrades each frame to a synchronous
    retry — with a per-frame warning and a summary count at close()
    (the reference's loud per-frame error barrier ethos,
    DynSlam.cpp:163-172) — while still writing every CSV row."""
    import dynslam_tpu.eval.fused_eval as fe

    def _dead_fetch(dev):
        raise RuntimeError("simulated relay error")

    monkeypatch.setattr(fe, "_fetch", _dead_fetch)

    root = str(tmp_path / "seq")
    write_kitti_sequence(root, num_frames=4, width=160, height=120,
                         with_dynamic=False, write_velodyne=True)
    out = str(tmp_path / "out")
    rc = main([
        "--dataset_root", root, "--out", out, "--tiny",
        "--no-dynamic_mode", "--fused", "--enable_evaluation",
        "--max_depth", "8",
    ])
    assert rc == 0
    err = capsys.readouterr().err
    assert "eval fetch thread failed" in err
    assert "eval background fetches failed" in err
    # every frame's rows still landed, in order
    uni = _rows_by_frame(os.path.join(out, "csv"),
                         "*unified-depth-result.csv")
    assert sorted(uni) == [1, 2, 3]
    mem = _rows_by_frame(os.path.join(out, "csv"), "*-memory.csv",
                         key="frame_id")
    assert sorted(mem) == [1, 2, 3]


def test_fused_eval_rejects_delay(tmp_path):
    root = str(tmp_path / "seq")
    write_kitti_sequence(root, num_frames=2, width=96, height=64)
    with pytest.raises(SystemExit):
        main([
            "--dataset_root", root, "--out", str(tmp_path / "o"), "--tiny",
            "--fused", "--enable_evaluation", "--evaluation_delay", "2",
        ])


def test_device_assoc_map_matches_host_rasterizer():
    """assoc_bits_to_map — the device association map built from the
    step's copy-mask bit-planes (sparing the per-frame ~0.5 MB assoc
    upload) — must match build_association_map pixel-exactly whenever
    the detections fit the K slots: same copy-mask rasterization, same
    det-order overwrite, same DYNAMIC/SKIP routing per track state."""
    from types import SimpleNamespace

    import jax.numpy as jnp

    from dynslam_tpu.eval.evaluation import (
        ASSOC_DYNAMIC, ASSOC_SKIP, build_association_map,
    )
    from dynslam_tpu.instances.track import TrackState
    from dynslam_tpu.io.segmentation import detections_from_instance_ids
    from dynslam_tpu.pipeline.fused_dynamic import (
        FusedDynamicPipeline, assoc_bits_to_map,
    )

    Ht, Wt = 96, 158
    objid = np.zeros((Ht, Wt), np.int16)
    objid[10:50, 10:60] = 1
    objid[30:70, 40:100] = 2
    objid[60:90, 120:150] = 3
    dets = detections_from_instance_ids(objid, min_size_px=8)
    assert len(dets) == 3
    # mixed states: certified DYNAMIC, still-Uncertain, and no track at
    # all (DYNAMIC only for reconstructable dets with a certain track)
    states = {
        id(dets[0]): TrackState.DYNAMIC,
        id(dets[1]): TrackState.UNCERTAIN,
    }
    host = build_association_map(
        Ht, Wt, SimpleNamespace(instance_detections=dets), None,
        det_states=states,
    )
    assert (host == ASSOC_DYNAMIC).any() and (host == ASSOC_SKIP).any()

    K = 4
    _, cb = FusedDynamicPipeline.pack_mask_bits(dets, Ht, Wt, K)
    codes = np.zeros(K, np.int8)
    for j, det in enumerate(dets):
        st = states.get(id(det))
        codes[j] = (
            ASSOC_DYNAMIC
            if det.is_reconstructable() and st is not None
            and st != TrackState.UNCERTAIN
            else ASSOC_SKIP
        )
    dev = np.asarray(assoc_bits_to_map(jnp.asarray(cb),
                                       jnp.asarray(codes), K))
    np.testing.assert_array_equal(dev, host)


@pytest.mark.slow
def test_crop_viewport_eval_render_matches_fullframe(tmp_path):
    """The eval compositor's crop-viewport instance render (the fast
    path when the detection bbox fits the fusion crop) must produce the
    same composited depth as the full-frame instance raycast wherever
    the object renders — pinned by running the fused dynamic eval with
    a small fusion crop (crop path forced) and with crop == frame
    (full path only) on the same sequence and comparing the dynamic
    bucket's CSV rows."""
    import dataclasses

    from dynslam_tpu.config import EvaluationParams, InstanceMapParams
    from dynslam_tpu.ops import depth as depth_ops
    from dynslam_tpu.pipeline.builder import build_fused
    from tests.test_dynamic_pipeline import dynamic_config

    root = str(tmp_path / "seq")
    write_kitti_sequence(root, num_frames=7, width=240, height=160,
                         with_dynamic=True, write_velodyne=True)

    def run(disable_crop_render, csv_dir):
        # SAME config both runs (the fusion crop changes the fused
        # volumes themselves); only the eval RENDER path differs
        cfg = dataclasses.replace(
            dynamic_config(),
            evaluation=EvaluationParams(enabled=True,
                                        semantic_evaluation=True),
        )
        imp = dataclasses.asdict(cfg.instance_map)
        imp.update(blocks_per_object=1024, local_dims=(48, 24, 64),
                   max_new_blocks_per_frame=512, fusion_crop=(112, 160))
        cfg = dataclasses.replace(cfg,
                                  instance_map=InstanceMapParams(**imp))
        pipe, input_, segp = build_fused(
            root, cfg, min_detection_size_px=8,
            with_evaluation=True, csv_out_dir=csv_dir,
        )
        if disable_crop_render:
            pipe.icfg_render = None
        n_crop_renders = [0]
        orig = pipe._flush_eval

        def counting_flush(force=False):
            if pipe._eval_pending is not None:
                n_crop_renders[0] += int(
                    (pipe._eval_pending[5] & pipe._eval_pending[7]).sum()
                )
            orig(force)

        pipe._flush_eval = counting_flush
        while input_.has_more_images():
            input_.read_next_frame()
            rgb, _ = input_.get_images()
            right_rgb = input_.get_stereo_color()[1]
            lg = np.asarray(depth_ops.rgb_to_gray(rgb))
            rg = np.asarray(depth_ops.rgb_to_gray(right_rgb))
            dets = segp.segment_frame(rgb).instance_detections
            pipe.process_frame(lg, rg, rgb, dets)
        pipe.finalize()
        pipe.evaluation.close()
        return n_crop_renders[0]

    crop_n = run(False, str(tmp_path / "csv_crop"))
    full_n = run(True, str(tmp_path / "csv_full"))
    assert crop_n > 0, (
        "crop-viewport render never ran — the fast path is untested "
        "(bbox + margin never fit the 112x160 crop?)"
    )
    assert full_n == 0  # icfg_render disabled: full-frame renders only

    dyn_a = _rows_by_frame(str(tmp_path / "csv_crop"),
                           "*dynamic-depth-result.csv")
    dyn_b = _rows_by_frame(str(tmp_path / "csv_full"),
                           "*dynamic-depth-result.csv")
    assert set(dyn_a) == set(dyn_b)
    # the crop render's shifted principal point ((u - (cx - u0)) vs
    # ((u + u0) - cx)) is float-equivalent but not bit-identical, so a
    # borderline ray may flip: allow a couple of counts per field
    for f in dyn_a:
        for col, va in dyn_a[f].items():
            if col == "frame":
                continue
            assert abs(int(va) - int(dyn_b[f][col])) <= 2, (
                f"frame {f} col {col}: crop {va} vs full {dyn_b[f][col]}"
            )
