"""Offline tools tests (tools/gen_anchors.py, tools/gen_annotation.py)."""
import os

import numpy as np
import pytest

from yolo_continuous_tpu.tools.gen_anchors import (avg_ratio, cas_ratio,
                                                   gen_anchors, kmeans,
                                                   load_voc_boxes)
from yolo_continuous_tpu.tools.gen_annotation import prepare_voc

XML_TMPL = """<annotation>
  <size><width>{w}</width><height>{h}</height></size>
  {objs}
</annotation>
"""
OBJ_TMPL = """<object>
    <name>{name}</name><difficult>{diff}</difficult>
    <bndbox><xmin>{x1}</xmin><ymin>{y1}</ymin><xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox>
  </object>"""


def _write_voc(root, n=12, seed=0):
    rs = np.random.RandomState(seed)
    ann = root / "VOCX" / "Annotations"
    img = root / "VOCX" / "JPEGImages"
    ann.mkdir(parents=True)
    img.mkdir(parents=True)
    for i in range(n):
        objs = []
        for _ in range(rs.randint(1, 4)):
            x1, y1 = rs.randint(0, 200, 2)
            objs.append(OBJ_TMPL.format(
                name=rs.choice(["cat", "dog"]), diff=0,
                x1=x1, y1=y1, x2=x1 + rs.randint(20, 120),
                y2=y1 + rs.randint(20, 120)))
        (ann / f"im{i}.xml").write_text(
            XML_TMPL.format(w=320, h=240, objs="\n".join(objs)))
        (img / f"im{i}.jpg").write_text("")  # placeholder
    return root


def test_cas_ratio_symmetric():
    box = np.array([0.2, 0.4])
    clus = np.array([[0.2, 0.4], [0.4, 0.8]])
    r = cas_ratio(box, clus)
    np.testing.assert_allclose(r, [1.0, 2.0])


def test_kmeans_converges(tmp_path):
    rs = np.random.RandomState(0)
    # two clear clusters of box sizes
    data = np.concatenate([rs.rand(50, 2) * 0.05 + 0.1,
                           rs.rand(50, 2) * 0.05 + 0.6])
    cluster, near = kmeans(data, 2, seed=0)
    assert cluster.shape == (2, 2)
    assert avg_ratio(data, cluster) < 1.5
    sizes = sorted(cluster[:, 0])
    assert sizes[0] < 0.3 < sizes[1]


def test_load_and_gen_anchors(tmp_path):
    _write_voc(tmp_path)
    data = load_voc_boxes(str(tmp_path / "VOCX" / "Annotations"))
    assert data.shape[1] == 2 and len(data) >= 12
    out_file = str(tmp_path / "anchors.txt")
    cluster = gen_anchors(str(tmp_path / "VOCX" / "Annotations"),
                          (640, 640), 4, out_file, seed=0)
    assert cluster.shape == (4, 2)
    # sorted by area (tools/gen_anchors.py:124-132)
    areas = cluster[:, 0] * cluster[:, 1]
    assert (np.diff(areas) >= 0).all()
    txt = open(out_file).read()
    assert len(txt.split(",")) == 8


def test_gen_anchors_cluster_plot(tmp_path):
    """Scatter plot parity (tools/gen_anchors.py:111-117)."""
    _write_voc(tmp_path)
    plot = str(tmp_path / "kmeans.jpg")
    gen_anchors(str(tmp_path / "VOCX" / "Annotations"), (640, 640), 4,
                str(tmp_path / "anchors.txt"), seed=0, plot_file=plot)
    import os
    assert os.path.exists(plot) and os.path.getsize(plot) > 1000


def test_prepare_voc(tmp_path, capsys):
    _write_voc(tmp_path)
    counts = prepare_voc(str(tmp_path), ["VOCX"], ["cat", "dog"], seed=0)
    assert set(counts) == {"cat", "dog"}
    for split in ("train", "val", "test", "trainval"):
        p = tmp_path / f"{split}.txt"
        assert p.exists()
    lines = (tmp_path / "trainval.txt").read_text().strip().splitlines()
    # trainval = 90% of 12 images, annotation-line format
    assert len(lines) == 10
    first = lines[0].split()
    assert first[0].endswith(".jpg")
    assert all(len(b.split(",")) == 5 for b in first[1:])


def test_voc_to_training_integration(tmp_path):
    """tools.prepare_voc output feeds Trainer.run unchanged (the reference's
    offline-prep -> train flow, tools/gen_annotation.py -> train.py)."""
    import cv2
    import yaml
    import jax.numpy as jnp
    from yolo_continuous_tpu.config.plan import TrainPlan
    from yolo_continuous_tpu.train.train_loop import Trainer

    rs = np.random.RandomState(0)
    root = _write_voc(tmp_path, n=8)
    # real JPEGs in place of the placeholders
    img_dir = root / "VOCX" / "JPEGImages"
    for p in img_dir.iterdir():
        cv2.imwrite(str(p), rs.randint(0, 255, (96, 128, 3), np.uint8))
    prepare_voc(str(root), ["VOCX"], ["cat", "dog"], seed=0)

    cfg = yaml.safe_load(open("cfg/chip_tiny.yaml"))
    cfg.update(train=str(root / "trainval.txt"), val=str(root / "val.txt"),
               labels=["cat", "dog"], epochs=1, batch_size=2, image_size=64,
               max_boxes=8, save_dir=str(tmp_path), save_name="voc_it",
               resume=False, warmup=False)
    plan = TrainPlan(cfg)
    logs = []
    state = Trainer(plan, dtype=jnp.float32).run(log=logs.append)
    assert int(state["step"]) >= 1
    assert any("loss" in l for l in logs)
