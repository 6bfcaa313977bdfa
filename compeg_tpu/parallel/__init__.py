"""Distribution layer: device meshes, sharded batched decode, band
(MCU-row) sharding, and boundary collectives — the subsystem the reference
has no counterpart for (single-device wgpu; SURVEY.md §2b)."""
