"""Driver entry points stay importable, jittable, and shardable."""

import numpy as np

import jax


class TestGraftEntry:
    def test_entry_traces_to_expected_shape(self):
        """entry() returns a traceable (fn, args) pair with the flagship
        output shape — eval_shape avoids the full ViT-B CPU compile (the
        driver compile-checks for real)."""
        import __graft_entry__ as ge

        fn, args = ge.entry()
        out = jax.eval_shape(fn, *args)
        assert out.shape == (1, 784, 4096)
        assert out.dtype == np.float32

    def test_dryrun_multichip_8(self):
        import __graft_entry__ as ge

        assert len(jax.devices()) >= 8
        ge.dryrun_multichip(8)

    def test_dryrun_multichip_subset(self):
        """Device subsets work: 1 device (mp=1 fallback; regression for
        the embed/alpha meshes disagreeing on the device set) and 6 of 8
        (dp=3 x mp=2 on a strict subset).  The dryrun asserts internally
        (device count, finite loss, finite alpha/X)."""
        import __graft_entry__ as ge

        ge.dryrun_multichip(1)
        ge.dryrun_multichip(6)
