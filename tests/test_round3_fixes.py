"""Round-3 fixes: derived synthetic prefilter margin, short-query serving.

(The serving-side short-query tests live in test_serving.py next to the
server fixture; this file covers the synthetic-data prefilter invariant.)
"""

import numpy as np


class TestSyntheticPrefilterMargin:
    def test_identical_output_at_small_cell_size(self):
        """The spatial prefilter must not change which objects land in a
        cell, even for nondefault small cell sizes where blob spreads
        (up to 6 m xy for buildings) exceed one cell_size.

        Rebuilds every grid cell with create_cell over ALL scene objects
        (no prefilter) and checks the kept instance sets match.
        """
        from text2pos_tpu.data.descriptions import create_cell
        from text2pos_tpu.data.synthetic import (make_synthetic_dataset,
                                                 make_synthetic_scene)

        seed, extent, cell_size = 3, 40.0, 10.0
        cells, _ = make_synthetic_dataset(
            seed=seed, extent=extent, cell_size=cell_size,
            objects_per_cell_area=12, poses_per_cell=1)
        assert len(cells) > 0

        # Replicate the scene generation exactly (same rng consumption
        # order as make_synthetic_dataset).
        rng = np.random.default_rng(seed)
        scene_objects = make_synthetic_scene(
            rng, extent=extent, objects_per_cell_area=12,
            cell_size=cell_size, include_stuff=False)

        for cell in cells:
            full = create_cell(0, cell.scene_name, cell.bbox_w,
                               scene_objects, num_mentioned=6)
            assert full is not None
            got = sorted(o.instance_id for o in cell.objects)
            want = sorted(o.instance_id for o in full.objects)
            assert got == want, (
                f"cell {cell.id}: prefiltered {got} != unfiltered {want}")

    def test_margin_covers_largest_blob(self):
        from text2pos_tpu.data.synthetic import _CLASS_PROFILES

        max_spread = max(p[0] for p in _CLASS_PROFILES.values())
        # The derivation in make_synthetic_dataset: 4σ of the widest blob.
        assert max(10.0, 4.0 * max_spread) >= 4.0 * 6.0
