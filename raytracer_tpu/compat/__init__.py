"""Reference-compatibility layer: host-side mirrors of reference
structures whose exact quirks the TPU pipeline intentionally does not
reproduce, kept for parity studies and oracle tests."""
