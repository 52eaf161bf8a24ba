"""Structured-random stress tests for CCL / extraction / absorption — the
analog of the reference's cargo-fuzz workspaces (impact_voxel fuzz targets:
absorption within sphere, split-off disconnected region, connected regions;
fuzz entry points at extraction.rs:2253-2387 take arbitrary-derived
structured inputs and assert invariants)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # many randomized cases: excluded from fast gate

from impact_tpu.voxel.encoding import is_encoded
from impact_tpu.voxel.interaction import (
    apply_absorption,
    connected_component_labels,
    empty_absorber_pools,
    split_off_disconnected_regions,
)
from impact_tpu.voxel.object import empty_voxel_object_pool, occupancy

G = 16
N_CASES = 12


def random_occupancy(rng, g=G, n_blobs=None):
    """Random union-of-spheres occupancy (structured input: blobs of varied
    radius/position — the arbitrary-derived shape the fuzz targets use)."""
    n_blobs = n_blobs or rng.integers(1, 6)
    occ = np.zeros((g, g, g), bool)
    idx = np.indices((g, g, g)).transpose(1, 2, 3, 0) + 0.5
    for _ in range(n_blobs):
        c = rng.uniform(2, g - 2, 3)
        r = rng.uniform(1.0, 4.0)
        occ |= np.sum((idx - c) ** 2, axis=-1) < r * r
    return occ


def numpy_components(occ):
    """Oracle 6-connected component labeling (scipy)."""
    from scipy import ndimage

    labels, n = ndimage.label(
        occ, structure=ndimage.generate_binary_structure(3, 1)
    )
    return labels, n


def pool_with_occ(occ, n_objects=8, slot=0):
    """Pool whose ``slot`` has SDF -1 inside ``occ``, +far outside."""
    pool = empty_voxel_object_pool(n_objects, occ.shape[0])
    sdf = np.where(occ, -1.0, 2.0).astype(np.float32)
    return pool._replace(
        sdf=pool.sdf.at[slot].set(jnp.asarray(sdf)),
        alive=pool.alive.at[slot].set(True),
    )


class TestCCLRandom:
    def test_labels_match_oracle_components(self):
        for case in range(N_CASES):
            rng = np.random.default_rng(1000 + case)
            occ = random_occupancy(rng)
            labels = np.asarray(
                connected_component_labels(jnp.asarray(occ))
            )
            oracle, n_oracle = numpy_components(occ)
            # empty voxels unlabeled
            assert (labels[~occ] < 0).all(), case
            # same number of components
            ours = np.unique(labels[occ])
            assert len(ours) == n_oracle, (case, len(ours), n_oracle)
            # label partition == oracle partition: each of our labels maps to
            # exactly one oracle component and vice versa
            for lab in ours:
                sel = labels == lab
                assert len(np.unique(oracle[sel])) == 1, case
            for comp in range(1, n_oracle + 1):
                sel = oracle == comp
                assert len(np.unique(labels[sel])) == 1, case


class TestExtractionRandom:
    def test_split_conserves_voxels_and_separates_components(self):
        for case in range(N_CASES):
            rng = np.random.default_rng(2000 + case)
            occ = random_occupancy(rng)
            pool = pool_with_occ(occ)
            total = int(occ.sum())
            _, n_oracle = numpy_components(occ)
            slots = jnp.asarray([1, 2, 3, 4, 5], jnp.int32)
            pool2, n_split, disconnected = split_off_disconnected_regions(
                pool, jnp.asarray(0), slots
            )
            occ2 = np.asarray(occupancy(pool2))
            alive2 = np.asarray(pool2.alive)
            # voxel conservation across all slots
            assert int(occ2[alive2].sum()) == total, case
            # every alive slot is exactly one connected component
            for s in np.nonzero(alive2)[0]:
                if occ2[s].sum() == 0:
                    continue
                _, n_s = numpy_components(occ2[s])
                assert n_s == 1, (case, s, n_s)
            # all components extracted (≤5 slots offered, ≥ n-1 needed)
            expected_split = min(n_oracle - 1, 5)
            assert int(n_split) == expected_split, (case, n_oracle)
            assert bool(disconnected) == (n_oracle - 1 > 5), case

    def test_split_never_mutates_other_objects(self):
        rng = np.random.default_rng(3000)
        occ_a = random_occupancy(rng)
        occ_b = random_occupancy(rng)
        pool = pool_with_occ(occ_a, slot=0)
        sdf_b = np.where(occ_b, -1.0, 2.0).astype(np.float32)
        pool = pool._replace(
            sdf=pool.sdf.at[6].set(jnp.asarray(sdf_b)),
            alive=pool.alive.at[6].set(True),
        )
        before = np.asarray(pool.sdf[6]).copy()
        pool2, _, _ = split_off_disconnected_regions(
            pool, jnp.asarray(0), jnp.asarray([1, 2], jnp.int32)
        )
        np.testing.assert_array_equal(before, np.asarray(pool2.sdf[6]))


class TestAbsorptionRandom:
    def _setup(self, rng, n_objects=4):
        g = G
        pool = empty_voxel_object_pool(n_objects, g)
        body_pos = np.zeros((n_objects + 2, 3), np.float32)
        for o in range(n_objects):
            occ = random_occupancy(rng, g)
            sdf = np.where(occ, -1.0, 2.0).astype(np.float32)
            pool = pool._replace(
                sdf=pool.sdf.at[o].set(jnp.asarray(sdf)),
                alive=pool.alive.at[o].set(True),
                origin=pool.origin.at[o].set(
                    jnp.asarray(rng.uniform(-8, 0, 3), jnp.float32)
                ),
            )
            body_pos[o] = rng.uniform(-4, 4, 3)
        absorbers = empty_absorber_pools(2)
        absorbers = absorbers._replace(
            sph_body=absorbers.sph_body.at[0].set(n_objects),
            sph_offset=absorbers.sph_offset.at[0].set(
                jnp.asarray(rng.uniform(-4, 4, 3), jnp.float32)
            ),
            sph_radius=absorbers.sph_radius.at[0].set(
                float(rng.uniform(2.0, 6.0))
            ),
            sph_rate=absorbers.sph_rate.at[0].set(50.0),
            sph_mask=absorbers.sph_mask.at[0].set(True),
        )
        body_ori = np.tile(
            np.asarray([0, 0, 0, 1], np.float32), (n_objects + 2, 1)
        )
        return pool, absorbers, jnp.asarray(body_pos), jnp.asarray(body_ori)

    def test_absorption_monotone_and_localized(self):
        for case in range(N_CASES):
            rng = np.random.default_rng(4000 + case)
            pool, absorbers, body_pos, body_ori = self._setup(rng)
            occ0 = np.asarray(occupancy(pool))
            pool2 = apply_absorption(
                pool, absorbers, body_pos, body_ori, gate_cap=2
            )
            occ1 = np.asarray(occupancy(pool2))
            # absorption only removes voxels, never creates them
            assert not (occ1 & ~occ0).any(), case
            # storage stays valid (encoded or finite f32)
            if not is_encoded(pool2.sdf):
                assert np.isfinite(np.asarray(pool2.sdf)).all(), case
            # absorbed objects are flagged for remesh
            changed = (occ0 != occ1).any(axis=(1, 2, 3))
            dirty = np.asarray(pool2.mesh_dirty)
            assert (~changed | dirty).all(), case

    def test_gated_matches_dense(self):
        for case in range(6):
            rng = np.random.default_rng(5000 + case)
            pool, absorbers, body_pos, body_ori = self._setup(rng)
            dense = apply_absorption(
                pool, absorbers, body_pos, body_ori, gate_cap=None
            )
            gated = apply_absorption(
                pool, absorbers, body_pos, body_ori, gate_cap=2
            )
            occ_d = np.asarray(occupancy(dense))
            occ_g = np.asarray(occupancy(gated))
            # the gate may DEFER objects beyond its cap, never diverge:
            # every gated-changed object matches the dense result exactly
            occ0 = np.asarray(occupancy(pool))
            for o in range(occ0.shape[0]):
                if (occ_g[o] != occ0[o]).any():
                    np.testing.assert_array_equal(occ_g[o], occ_d[o])
