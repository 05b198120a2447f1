"""CLI script tests (the CPU-safe ETL/tooling scripts; train/predict are
exercised on the TPU — see .claude/skills/verify/SKILL.md)."""

import importlib
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pointnet2_tpu.data.io import load_labels, read_pcd, write_labels, write_pcd


def _run_main(module_name, argv, monkeypatch):
    mod = importlib.import_module(module_name)
    monkeypatch.setattr(sys, "argv", [module_name + ".py"] + argv)
    mod.main()
    return mod


class TestPreprocess:
    def test_txt_to_pcd(self, rng, tmp_path, monkeypatch):
        import preprocess

        txt = tmp_path / "scene.txt"
        rows = [
            f"{x:.3f} {y:.3f} {z:.3f} {int(i * 100)} {r} {g} {b}"
            for x, y, z, i, r, g, b in rng.rand(50, 7) * [10, 10, 5, 1, 255, 255, 255]
        ]
        txt.write_text("\n".join(rows) + "\n")
        preprocess.point_cloud_txt_to_pcd(str(tmp_path), "scene")
        cloud = read_pcd(tmp_path / "scene.pcd")
        assert len(cloud) == 50
        # idempotent skip
        preprocess.point_cloud_txt_to_pcd(str(tmp_path), "scene")

    def test_missing_txt_skipped(self, tmp_path):
        import preprocess

        preprocess.point_cloud_txt_to_pcd(str(tmp_path), "nope")  # no raise


class TestDownsample:
    def test_down_sample_flow(self, rng, tmp_path):
        import downsample

        pts = rng.rand(5000, 3) * 5
        labels = rng.randint(0, 9, 5000)
        write_pcd(tmp_path / "a.pcd", pts, rng.rand(5000, 3))
        write_labels(tmp_path / "a.labels", labels)
        downsample.down_sample(
            str(tmp_path / "a.pcd"),
            str(tmp_path / "a.labels"),
            str(tmp_path / "a_ds.pcd"),
            str(tmp_path / "a_ds.labels"),
            voxel_size=0.25,
        )
        ds = read_pcd(tmp_path / "a_ds.pcd")
        ds_labels = load_labels(tmp_path / "a_ds.labels")
        assert 0 < len(ds) < 5000
        assert len(ds_labels) == len(ds)
        assert (ds_labels != 0).all()  # label-0 points dropped before voxelizing
        # skip-if-done
        downsample.down_sample(
            str(tmp_path / "a.pcd"),
            str(tmp_path / "a.labels"),
            str(tmp_path / "a_ds.pcd"),
            str(tmp_path / "a_ds.labels"),
            voxel_size=0.25,
        )


class TestColorize:
    def test_colorize_dir(self, rng, tmp_path, monkeypatch):
        pts = rng.rand(100, 3)
        write_pcd(tmp_path / "pred.pcd", pts)
        write_labels(tmp_path / "pred.labels", rng.randint(0, 9, 100))
        _run_main("colorize", ["--input_dir", str(tmp_path)], monkeypatch)
        out = read_pcd(tmp_path / "pred_colored.pcd")
        assert out.colors is not None


class TestVisualize:
    def test_png_render(self, rng, tmp_path, monkeypatch):
        pts = rng.rand(500, 3) * 10
        write_pcd(tmp_path / "v.pcd", pts)
        write_labels(tmp_path / "v.labels", rng.randint(0, 9, 500))
        out = tmp_path / "v.png"
        _run_main(
            "visualize",
            [
                "--pcd", str(tmp_path / "v.pcd"),
                "--labels", str(tmp_path / "v.labels"),
                "--out", str(out),
            ],
            monkeypatch,
        )
        assert out.exists() and out.stat().st_size > 1000

    def test_stats_only(self, rng, tmp_path, monkeypatch):
        write_pcd(tmp_path / "s.pcd", rng.rand(20, 3))
        _run_main(
            "visualize", ["--pcd", str(tmp_path / "s.pcd"), "--stats"], monkeypatch
        )


class TestRenamer:
    def test_rename_submission(self, tmp_path, monkeypatch):
        src = tmp_path / "sg27_station3_intensity_rgb.labels"
        src.write_text("1\n2\n")
        other = tmp_path / "unknown.labels"
        other.write_text("0\n")
        _run_main("renamer", ["--dense_dir", str(tmp_path)], monkeypatch)
        assert (tmp_path / "sg27_3.labels").exists()
        assert not src.exists()
        assert other.exists()  # unknown names untouched


class TestConfigCLI:
    def test_config_files_load(self):
        from pointnet2_tpu.config import Config

        cfg = Config.from_json("semantic.json")
        assert cfg.use_color == 1 and cfg.num_point == 8192
        ncfg = Config.from_json("semantic_no_color.json")
        assert ncfg.use_color == 0 and ncfg.box_size_x == 60

    def test_unknown_key_rejected(self, tmp_path):
        from pointnet2_tpu.config import Config

        p = tmp_path / "bad.json"
        p.write_text('{"num_point": 128, "bogus": 1}')
        with pytest.raises(ValueError, match="bogus"):
            Config.from_json(p)


class TestHtmlViewer:
    def test_write_html_viewer(self, rng, tmp_path):
        from pointnet2_tpu.utils.html_viewer import write_html_viewer

        pts = rng.rand(5000, 3) * 10
        cols = rng.rand(5000, 3)
        out = tmp_path / "cloud.html"
        write_html_viewer(pts, cols, out, title="test cloud")
        html = out.read_text()
        assert html.startswith("<!DOCTYPE html>")
        assert "test cloud" in html and "5,000 points" in html
        assert '"n": 5000' in html
        # embedded data decodes to the right sizes
        import base64, re
        b64 = re.search(r'decode\("([A-Za-z0-9+/=]+)", Float32Array\)', html)
        assert len(base64.b64decode(b64.group(1))) == 5000 * 3 * 4

    def test_visualize_html_flag(self, rng, tmp_path, monkeypatch):
        import sys

        from pointnet2_tpu.data.io import write_pcd

        pcd = tmp_path / "cloud.pcd"
        write_pcd(pcd, rng.rand(1000, 3), rng.rand(1000, 3))
        out_html = tmp_path / "viewer.html"
        monkeypatch.setattr(
            sys, "argv",
            ["visualize.py", "--pcd", str(pcd), "--out",
             str(tmp_path / "x.png"), "--html", str(out_html)],
        )
        import visualize

        visualize.main()
        assert out_html.is_file() and out_html.stat().st_size > 10_000
