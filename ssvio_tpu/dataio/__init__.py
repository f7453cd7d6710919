"""Host-side dataset loading, trajectory export, synthetic scene generation."""
