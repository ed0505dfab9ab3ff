"""Prior adjustment: write estimated noise and per-barcode estimated
concentrations back into a job document (reference classifier.h:125-160,
transcode.cpp:1884-1941, tool/pheniqs-prior-api.py:39-56)."""

from __future__ import annotations


def adjust_decoder_prior(decoder_ontology: dict, final: dict, spec):
    """Apply one classifier's estimates onto its (uncompiled) ontology node."""
    decoder_ontology["noise"] = final["estimated noise"]
    if spec is None or spec.panel is None:
        return
    concentration_by_barcode: dict[str, float] = {}
    for b, entry in enumerate(final["barcodes"][1:]):
        flat = "-".join(spec.panel.barcode_strings[b])
        concentration_by_barcode[flat] = entry.get("estimated concentration", 0.0)

    codec = decoder_ontology.get("codec")
    if not isinstance(codec, dict):
        return
    for record in codec.values():
        barcode = record.get("barcode")
        if not barcode:
            continue
        # match progressively longer prefixes, mirroring the reference's
        # incremental lookup (classifier.h:139-158)
        barcode_string = ""
        for segment in barcode:
            if barcode_string:
                barcode_string += "-"
            barcode_string += segment
            if barcode_string in concentration_by_barcode:
                record["concentration"] = concentration_by_barcode[barcode_string]


def apply_prior_adjustment(document: dict, engine):
    """Adjust sample/molecular/cellular decoders in an assembled job
    document from the engine's accumulated statistics."""
    if engine is None:
        return
    if engine.sample is not None and isinstance(document.get("sample"), dict):
        adjust_decoder_prior(
            document["sample"],
            engine.sample.accumulator.finalize(),
            engine.sample.spec,
        )
    for key, runtimes in (
        ("molecular", engine.molecular),
        ("cellular", engine.cellular),
    ):
        node = document.get(key)
        if isinstance(node, list):
            for index, element in enumerate(node):
                if index < len(runtimes) and isinstance(element, dict):
                    adjust_decoder_prior(
                        element,
                        runtimes[index].accumulator.finalize(),
                        runtimes[index].spec,
                    )
        elif isinstance(node, dict) and runtimes:
            adjust_decoder_prior(
                node, runtimes[0].accumulator.finalize(), runtimes[0].spec
            )
