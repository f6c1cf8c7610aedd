"""Source abstractions: the change-feed source factory (file-backed for
tests, MongoDB connector config for production)."""
