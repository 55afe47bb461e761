"""Source/sink connectors and the test-table catalog."""
