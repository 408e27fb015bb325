"""Source/sink builders: Kafka (streaming + batch) and file streams."""
