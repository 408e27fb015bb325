"""Structured Streaming layer: the reference's KStream/KTable
topologies re-expressed as streaming DataFrames, plus serving,
audit, and custom-stateful escape hatches."""
