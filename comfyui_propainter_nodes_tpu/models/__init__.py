"""Model zoo: RAFT, RecurrentFlowCompleteNet, InpaintGenerator (all
functional JAX, flat torch-named param dicts)."""
