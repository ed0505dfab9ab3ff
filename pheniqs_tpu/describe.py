"""`--validate` pretty printer (reference transcode.cpp:1944-2283).

Round 1 carries a minimal structural description; the full byte-compatible
describe output is tracked against test/BDGGG/valid/validate_*.out.
"""

from __future__ import annotations


def describe_instruction(ontology: dict, stream, display_distance: bool = False):
    w = stream.write
    w("Environment\n\n")
    for key in (
        "base input url",
        "base output url",
        "platform",
        "quality tracking",
        "filter incoming qc fail",
        "filter outgoing qc fail",
        "input phred offset",
        "output phred offset",
        "leading segment index",
        "default output format",
        "default output compression",
        "default output compression level",
        "feed buffer capacity",
        "threads",
        "decoding threads",
        "htslib threads",
    ):
        if key in ontology:
            w(f"    {key} : {ontology[key]}\n")
    w("\nInput\n\n")
    for index, url in enumerate(ontology.get("input", [])):
        w(f"    Input segment No.{index} : {url}\n")
    w("\nOutput\n\n")
    for index, url in enumerate(ontology.get("output", [])):
        w(f"    Output segment No.{index} : {url}\n")
    for topic in ("sample", "molecular", "cellular"):
        node = ontology.get(topic)
        if node is None:
            continue
        decoders = node if isinstance(node, list) else [node]
        for decoder in decoders:
            w(f"\n{topic.capitalize()} decoder\n\n")
            for key in (
                "algorithm",
                "confidence threshold",
                "noise",
                "segment cardinality",
                "nucleotide cardinality",
                "barcode cardinality",
            ):
                if key in decoder:
                    w(f"    {key} : {decoder[key]}\n")
