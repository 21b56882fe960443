"""Checkpoint / resume of trained artifacts.

The reference can dump/reload trees, Q and Gamma as text files
(reference: classTree_host.h:15-60 tree_eye.txt/tree_light.txt,
device_thrust.cu:3347-3404 Q.txt/E.txt; hooks optixPathTracer.cpp:573-603).
Here the whole SubspaceState (classifiers + Q + CMFGamma) plus optionally the
film serialize as one npz.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .train import classify


def save_subspace_state(path: str, ss: classify.SubspaceState,
                        film=None) -> None:
    arrays = dict(
        eye_centers_pos=np.asarray(ss.eye.centers_pos),
        eye_centers_norm=np.asarray(ss.eye.centers_norm),
        eye_diag2=np.asarray(ss.eye.diag2),
        light_centers_pos=np.asarray(ss.light.centers_pos),
        light_centers_norm=np.asarray(ss.light.centers_norm),
        light_diag2=np.asarray(ss.light.diag2),
        q=np.asarray(ss.q),
        cmf_gamma=np.asarray(ss.cmf_gamma),
        trained=np.asarray(ss.trained),
        second_stage=np.asarray(ss.second_stage),
    )
    if ss.inv_occ is not None:
        arrays["inv_occ"] = np.asarray(ss.inv_occ)
    if ss.alias_prob is not None:
        arrays["alias_prob"] = np.asarray(ss.alias_prob)
        arrays["alias_idx"] = np.asarray(ss.alias_idx)
    if ss.nn is not None:
        arrays["nn_w1"] = np.asarray(ss.nn.w1)
        arrays["nn_b1"] = np.asarray(ss.nn.b1)
        arrays["nn_w2"] = np.asarray(ss.nn.w2)
        arrays["nn_b2"] = np.asarray(ss.nn.b2)
        arrays["nn_close_set"] = np.asarray(ss.nn.close_set)
        arrays["nn_scene_lo"] = np.asarray(ss.nn.scene_lo)
        arrays["nn_scene_hi"] = np.asarray(ss.nn.scene_hi)
        arrays["nn_blend"] = np.asarray(ss.nn.blend)
    if film is not None:
        arrays["film_accum"] = np.asarray(film.accum)
        arrays["film_subframe"] = np.asarray(film.subframe)
        arrays["film_shape"] = np.asarray([film.width, film.height])
    np.savez_compressed(path, **arrays)


def load_subspace_state(path: str) -> classify.SubspaceState:
    z = np.load(path)
    eye = classify.Classifier(centers_pos=jnp.asarray(z["eye_centers_pos"]),
                              centers_norm=jnp.asarray(z["eye_centers_norm"]),
                              diag2=jnp.asarray(z["eye_diag2"]))
    light = classify.Classifier(
        centers_pos=jnp.asarray(z["light_centers_pos"]),
        centers_norm=jnp.asarray(z["light_centers_norm"]),
        diag2=jnp.asarray(z["light_diag2"]))
    alias_prob = jnp.asarray(z["alias_prob"]) if "alias_prob" in z else None
    alias_idx = jnp.asarray(z["alias_idx"]) if "alias_idx" in z else None
    inv_occ = jnp.asarray(z["inv_occ"]) if "inv_occ" in z else None
    if "second_stage" in z:
        second = str(z["second_stage"])
    else:
        # Legacy checkpoint (pre second_stage/inv_occ): the mixture second
        # stage needs inv_occ for its MIS rates; without it mix_coeffs falls
        # back to pure-weighted rates while sampling from the mixture — a
        # sampler/rate miscalibration. Default legacy states to 'weighted'.
        second = "weighted"
    nn = None
    if "nn_w1" in z:
        from .train import nn_classifier as nn_mod
        nn = nn_mod.NNTables(
            w1=jnp.asarray(z["nn_w1"]), b1=jnp.asarray(z["nn_b1"]),
            w2=jnp.asarray(z["nn_w2"]), b2=jnp.asarray(z["nn_b2"]),
            close_set=jnp.asarray(z["nn_close_set"]),
            scene_lo=jnp.asarray(z["nn_scene_lo"]),
            scene_hi=jnp.asarray(z["nn_scene_hi"]),
            blend=float(z["nn_blend"]))
    return classify.publish_tables(classify.SubspaceState(
        eye=eye, light=light,
        q=jnp.asarray(z["q"]),
        cmf_gamma=jnp.asarray(z["cmf_gamma"]),
        alias_prob=alias_prob, alias_idx=alias_idx,
        inv_occ=inv_occ, nn=nn,
        trained=bool(z["trained"]),
        second_stage=second))
