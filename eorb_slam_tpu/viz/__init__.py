"""Host-side visualization (the reference's L9 layer, minus Pangolin)."""
