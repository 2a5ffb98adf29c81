"""Sources: batch table loaders and the streaming-source shapes."""
