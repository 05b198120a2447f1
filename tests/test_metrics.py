"""ConfusionMatrix math vs the reference's hand-computed self-test
(util/metric.py:127-168), plus vectorized/jax update equivalence."""

import numpy as np

from pointnet2_tpu.utils.metrics import ConfusionMatrix, confusion_matrix_jax

REF_CM = np.array([[0, 1, 2, 3], [0, 4, 5, 6], [0, 7, 8, 9], [0, 10, 11, 12]])


def _build_scalar():
    cm = ConfusionMatrix(4)
    for gt in range(4):
        for pd in range(4):
            for _ in range(REF_CM[gt, pd]):
                cm.increment(gt, pd)
    return cm


def test_reference_golden_values():
    cm = _build_scalar()
    np.testing.assert_array_equal(cm.confusion_matrix, REF_CM)
    want_ious = np.array(
        [
            4.0 / (4 + 7 + 10 + 5 + 6),
            8.0 / (5 + 8 + 11 + 7 + 9),
            12.0 / (6 + 9 + 12 + 10 + 11),
        ]
    )
    np.testing.assert_allclose(cm.get_per_class_ious(), want_ious)
    assert cm.get_mean_iou() == np.mean(want_ious)
    assert cm.get_accuracy() == float(4 + 8 + 12) / ((4 + 12) * 9 / 2)


def test_vectorized_update_matches_scalar(rng):
    gt = rng.randint(0, 4, size=500)
    pd = rng.randint(0, 4, size=500)
    a = ConfusionMatrix(4)
    for g, p in zip(gt, pd):
        a.increment(int(g), int(p))
    b = ConfusionMatrix(4)
    b.increment_from_list(gt, pd)
    np.testing.assert_array_equal(a.confusion_matrix, b.confusion_matrix)


def test_jax_update_matches_numpy(rng):
    gt = rng.randint(0, 9, size=(2, 64))
    pd = rng.randint(0, 9, size=(2, 64))
    cm_dev = confusion_matrix_jax(gt, pd, 9)
    a = ConfusionMatrix(9)
    a.increment_from_matrix(cm_dev)
    b = ConfusionMatrix(9)
    b.increment_from_list(gt.ravel(), pd.ravel())
    np.testing.assert_array_equal(a.confusion_matrix, b.confusion_matrix)


def test_invalid_labels_raise():
    cm = ConfusionMatrix(3)
    for bad in [(-1, 0), (3, 0), (0, -1), (0, 3)]:
        try:
            cm.increment(*bad)
            raise AssertionError("expected ValueError")
        except ValueError:
            pass


def test_format_metrics_table():
    from pointnet2_tpu.utils.metrics import ConfusionMatrix

    cm = ConfusionMatrix(3)
    cm.increment_from_list([1, 1, 2, 2, 2], [1, 2, 2, 2, 1])
    labels = ["unlabeled", "car", "tree"]
    text = cm.format_metrics(labels)
    assert "Confusion matrix:" in text
    for name in labels:
        assert name in text
    # matrix content appears row-aligned
    assert "mIoU:" in text and "Overall accuracy:" in text
    # IoU values: car 1/(2+2-1)=1/3, tree 2/(3+3-2)=0.5
    assert "car: 0.333333" in text
    assert "tree: 0.500000" in text
    import re
    m = re.search(r"mIoU: ([0-9.]+)", text)
    assert abs(float(m.group(1)) - (1 / 3 + 0.5) / 2) < 1e-6


def test_print_metrics_wrong_labels_raise():
    from pointnet2_tpu.utils.metrics import ConfusionMatrix
    import pytest

    with pytest.raises(ValueError):
        ConfusionMatrix(3).format_metrics(["a", "b"])
