"""Pipeline plans: metadata upsert, incremental work-list, layer runners."""
