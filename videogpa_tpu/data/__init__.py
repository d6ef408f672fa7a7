"""Host-side data plumbing: video IO, frame sampling, prefetch."""
