"""PCA / KMeans kernels vs hand-computed small matrices (SURVEY.md §6.1).
Pure numpy — no Ray."""

from __future__ import annotations

import numpy as np

from osm_data_classification_ray.stages import kmeans, normalize, pca


class TestNormalize:
    def test_zscore_and_zero_variance(self):
        X = np.array([[1.0, 5.0], [3.0, 5.0], [5.0, 5.0]])
        Z, mean, std = normalize.normalize_local(X)
        assert np.allclose(mean, [3.0, 5.0])
        assert np.allclose(std, [np.sqrt(8 / 3), 0.0])
        assert np.allclose(Z[:, 0], (X[:, 0] - 3.0) / np.sqrt(8 / 3))
        assert np.all(Z[:, 1] == 0.0)  # zero-variance column → 0


class TestPCA:
    def test_known_2d(self):
        """Points on the line y = 2x: first component ∝ (1, 2)/√5,
        explained variance ratio = 1."""
        t = np.array([-2.0, -1.0, 0.0, 1.0, 2.0])
        X = np.stack([t, 2 * t], axis=1)
        m = pca.fit_local(X, threshold=0.85)
        assert len(m.explained_variance) == 1
        assert np.allclose(np.abs(m.components[0]), np.array([1, 2]) / np.sqrt(5))
        assert np.isclose(m.explained_variance_ratio[0], 1.0)
        # frozen sign: largest-|loading| coordinate positive
        assert m.components[0][np.argmax(np.abs(m.components[0]))] > 0

    def test_variance_matches_numpy_cov(self):
        rng = np.random.default_rng(2)
        X = rng.normal(size=(200, 4)) @ np.diag([3.0, 2.0, 1.0, 0.5])
        m = pca.fit_local(X, threshold=0.999)
        w = np.linalg.eigvalsh(np.cov(X.T))[::-1]
        assert np.allclose(m.explained_variance, w[: len(m.explained_variance)], rtol=1e-10)

    def test_moments_path_equals_direct(self):
        rng = np.random.default_rng(4)
        X = rng.normal(size=(100, 5))
        m1 = pca.fit_local(X)
        m2 = pca.fit_from_moments(100, X.sum(axis=0), X.T @ X)
        assert np.array_equal(m1.components, m2.components)

    def test_transform_roundtrip(self):
        rng = np.random.default_rng(6)
        X = rng.normal(size=(50, 3))
        m = pca.fit_local(X, threshold=0.9999999)  # keep all comps
        pcs = (X - m.mean) @ m.components.T
        back = pcs @ m.components + m.mean
        assert np.allclose(back, X, atol=1e-8)


class TestKMeans:
    def test_two_obvious_clusters(self):
        X = np.array([[0.0, 0], [0.1, 0], [-0.1, 0], [10.0, 0], [10.1, 0], [9.9, 0]])
        model, labels = kmeans.fit_local(X, 2)
        assert len(set(labels[:3])) == 1 and len(set(labels[3:])) == 1
        assert labels[0] != labels[3]
        cents = sorted(model.centroids[:, 0].tolist())
        assert np.allclose(cents, [0.0, 10.0], atol=1e-6)
        assert model.inertia < 0.1

    def test_deterministic(self):
        rng = np.random.default_rng(9)
        X = rng.normal(size=(500, 4))
        m1, l1 = kmeans.fit_local(X, 4)
        m2, l2 = kmeans.fit_local(X, 4)
        assert np.array_equal(m1.centroids, m2.centroids)
        assert np.array_equal(l1, l2)

    def test_assign_tie_breaks_low_index(self):
        cents = np.array([[0.0, 0.0], [2.0, 0.0]])
        labels, d2 = kmeans.assign_points(np.array([[1.0, 0.0]]), cents)
        assert labels[0] == 0  # exactly equidistant → lowest cluster index
        assert np.isclose(d2[0], 1.0)

    def test_elbow_rule(self):
        inertias = {1: 100.0, 2: 40.0, 3: 35.0, 4: 33.0, 5: 31.0, 6: 30.0, 7: 29.0, 8: 28.5}
        # first k with inertia(k)/inertia(k-1) > 0.8 → k=3 (35/40=0.875)
        assert kmeans.choose_k_by_elbow(inertias) == 3

    def test_model_roundtrip_table(self):
        m = kmeans.KMeansModel(np.array([[1.0, 2.0], [3.0, 4.0]]), 5.0)
        t = m.to_table()
        m2 = kmeans.KMeansModel.from_table(t)
        assert np.array_equal(m.centroids, m2.centroids)
        assert m.inertia == m2.inertia

    def test_pca_model_roundtrip_table(self):
        m = pca.PCAModel(np.array([0.5, 0.5]), np.array([[1.0, 0.0]]),
                         np.array([2.0]), np.array([1.0]))
        m2 = pca.PCAModel.from_table(m.to_table())
        assert np.array_equal(m.components, m2.components)
        assert np.array_equal(m.mean, m2.mean)
