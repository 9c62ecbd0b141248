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

    def test_dryrun_multichip_odd(self):
        """Odd device counts fall back to mp=1."""
        import __graft_entry__ as ge

        ge.dryrun_multichip(1)
