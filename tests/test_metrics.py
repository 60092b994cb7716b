import numpy as np
import jax.numpy as jnp

from segmif_tpu.eval.metrics import (
    colorize_labels,
    compute_results,
    confusion_matrix,
    scores,
)


def _sklearn_style_confusion(true, pred, n):
    m = np.zeros((n, n), dtype=np.int64)
    for t, p in zip(true.ravel(), pred.ravel()):
        if 0 <= t < n:
            m[t, p] += 1
    return m


def test_confusion_matrix_matches_naive(rng):
    n = 9
    true = rng.integers(0, n, size=(4, 16, 16))
    pred = rng.integers(0, n, size=(4, 16, 16))
    got = np.asarray(confusion_matrix(jnp.asarray(true), jnp.asarray(pred), n))
    np.testing.assert_array_equal(got, _sklearn_style_confusion(true, pred, n))


def test_confusion_matrix_ignores_255(rng):
    n = 9
    true = rng.integers(0, n, size=(128,))
    pred = rng.integers(0, n, size=(128,))
    true_ig = true.copy()
    true_ig[::3] = 255
    got = np.asarray(confusion_matrix(jnp.asarray(true_ig), jnp.asarray(pred), n))
    np.testing.assert_array_equal(got, _sklearn_style_confusion(true_ig, pred, n))


def test_scores_perfect_prediction(rng):
    n = 5
    true = rng.integers(0, n, size=(1000,))
    hist = np.asarray(confusion_matrix(jnp.asarray(true), jnp.asarray(true), n))
    s = scores(hist)
    assert s["Pixel Accuracy"] == 1.0
    assert s["Mean IoU"] == 1.0


def test_compute_results_known_case():
    conf = np.array([[5, 1], [2, 8]], dtype=np.float64)
    precision, recall, iou = compute_results(conf)
    np.testing.assert_allclose(precision, [5 / 7, 8 / 9])
    np.testing.assert_allclose(recall, [5 / 6, 8 / 10])
    np.testing.assert_allclose(iou, [5 / 8, 8 / 11])


def test_compute_results_absent_class():
    conf = np.zeros((3, 3))
    conf[0, 0] = 10
    precision, recall, iou = compute_results(conf)
    assert np.isnan(iou[1]) and np.isnan(iou[2])
    assert iou[0] == 1.0


def test_colorize_labels():
    lab = np.array([[0, 1], [8, 3]])
    rgb = colorize_labels(lab)
    assert rgb.shape == (2, 2, 3)
    assert rgb.dtype == np.uint8
    assert tuple(rgb[0, 1]) == (64, 0, 128)
