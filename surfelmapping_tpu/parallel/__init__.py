"""Multi-chip execution: slot-sharded surfel map over a device mesh."""
