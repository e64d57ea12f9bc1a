"""Data-ops (dedup/similarity/text/multimodal/streaming) registrations."""
