"""Training-data-pipeline operators beyond the reference's own inventory
(deduplication, similarity search, text analysis, multimodal plumbing) —
first-class components for the 100 TB use case, each expressed
Ray-Data-first (map_batches combiners before any shuffle, broadcast
small sides, actor pools for stateful stages)."""
