"""Detector query registrations (filled in §2 batch 2)."""
