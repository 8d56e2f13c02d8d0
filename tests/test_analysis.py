"""Compare-sweep analysis helpers (reference test/metrics.py:446-499)."""

from flairtpu.zone.analysis import analyze_param, flatten_metrics, plot_metrics


def _records():
    def rec(key, miou):
        return {key: {"Avg_metrics_name": ["mIoU", "Overall Accuracy"],
                      "Avg_metrics": [miou, 50.0],
                      "classes": ["a", "b"], "per_class_iou": [1, 2]}}
    return [rec("size=128_stride=96_margin=16_0_0", 40.0),
            rec("size=128_stride=96_margin=16_0_128", 44.0),
            rec("size=256_stride=192_margin=32_0_0", 50.0),
            rec("size=256_stride=192_margin=32_128_0", 54.0)]


def test_flatten_and_analyze():
    rows = flatten_metrics(_records())
    assert len(rows) == 4
    assert rows[0]["mIoU"] == 40.0 and "per_class_iou" in rows[0]
    points = analyze_param(rows, "size", "mIoU")
    assert points == [(128.0, 42.0), (256.0, 52.0)]


def test_plot_metrics(tmp_path):
    rows = flatten_metrics(_records())
    points = analyze_param(rows, "size", "mIoU")
    png = plot_metrics(points, "size", "mIoU", out_png=tmp_path / "p.png")
    assert png.exists() and png.stat().st_size > 1000


def test_analyze_compare_cli(tmp_path, capsys):
    import json

    from flairtpu.tools import main as tools_main

    (tmp_path / "m.json").write_text(json.dumps(_records()))
    tools_main(["analyze-compare", str(tmp_path / "m.json"),
                "--param", "size", "--metric", "mIoU",
                "--out-png", str(tmp_path / "plot.png")])
    out = capsys.readouterr().out
    assert "size=128: mIoU=42.0000" in out
    assert (tmp_path / "plot.png").exists()
