import numpy as np
import jax.numpy as jnp

from spcbpt_tpu.train import classify, tree


def test_octree_learns_centroid_labels():
    """Build the octree from nearest-centroid labels (the reference's
    pipeline) and check it reproduces them with high accuracy, as the
    reference's acc printout expects (classTree_host.h:392)."""
    rng = np.random.default_rng(0)
    n = 20000
    pos = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    # surface-like normals: one of the six axis directions (scene walls),
    # matching the distribution the reference's tree sees
    axes = np.eye(3, dtype=np.float32)
    axes = np.concatenate([axes, -axes])
    normal = axes[rng.integers(0, 6, n)]
    w = rng.uniform(0.1, 1.0, n)

    cls = classify.build_classifier(pos, normal, w, 64)
    labels = np.asarray(classify.classify(cls, jnp.asarray(pos),
                                          jnp.asarray(normal)))
    t = tree.build_tree(pos, normal, labels, w)
    acc = tree.tree_accuracy(t, pos, normal, labels)
    assert acc > 0.90, acc  # reference prints ~99% on its own scene data


def test_octree_pure_regions_exact():
    """Axis-separable labels are learned exactly."""
    rng = np.random.default_rng(1)
    n = 5000
    pos = rng.uniform(0, 8, (n, 3)).astype(np.float32)
    normal = np.tile(np.asarray([0, 0, 1], np.float32), (n, 1))
    labels = (pos[:, 0] > 4).astype(np.int64)
    t = tree.build_tree(pos, normal, labels, np.ones(n))
    acc = tree.tree_accuracy(t, pos, normal, labels)
    assert acc > 0.99, acc
