import numpy as np
import pytest

from cnmnet_tpu.data.grain_pipeline import make_grain_loader
from cnmnet_tpu.data.synthetic import SyntheticScenes


@pytest.fixture(scope="module")
def ds():
    return SyntheticScenes(num_samples=8, height=16, width=16)


class TestGrainLoader:
    def test_batching_contract(self, ds):
        batches = list(make_grain_loader(ds, batch_size=4, seed=1, num_epochs=1))
        assert len(batches) == 2
        b = batches[0]
        assert b["images"].shape == (4, 3, 16, 16, 3)
        assert b["depths"].shape == (4, 3, 16, 16)
        assert b["planes_num"].shape == (4,)

    def test_deterministic_shuffle(self, ds):
        a = list(make_grain_loader(ds, batch_size=4, seed=7, num_epochs=1))
        b = list(make_grain_loader(ds, batch_size=4, seed=7, num_epochs=1))
        np.testing.assert_array_equal(a[0]["disparity"], b[0]["disparity"])
        c = list(make_grain_loader(ds, batch_size=4, seed=8, num_epochs=1))
        assert not np.array_equal(a[0]["disparity"], c[0]["disparity"])

    def test_multihost_sharding_partitions_data(self, ds):
        """Two shards must cover disjoint halves of the index space."""
        shards = []
        for idx in (0, 1):
            batches = list(
                make_grain_loader(
                    ds, batch_size=2, seed=1, num_epochs=1,
                    shard_index=idx, shard_count=2, shuffle=False,
                )
            )
            ids = np.concatenate([b["disparity"].reshape(len(b["disparity"]), -1)[:, 0] for b in batches])
            shards.append(set(np.round(ids, 6)))
        assert len(shards[0] & shards[1]) == 0
        assert len(shards[0]) + len(shards[1]) == 8
