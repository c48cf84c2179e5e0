"""I/O, caching, timers, logging, visualization output."""
