"""Application model families built on the NUFFT (MRI reconstruction)."""
