"""Vision surface — prompt templating, tag extraction, deterministic
description substitute.

The reference's vision providers (``src/core/image-services/*``, ~1330 LoC)
are network chat-completion calls and are NOT ported as I/O. What is
ported deterministically:

* ``formatImagePrompt`` / ``IMAGE_PROMPT_TEMPLATE``
  (``src/core/templates/image-prompt-template.ts:12-53``) — the exact
  prompt the reference would send, reused as the description-slot payload;
* ``extractDescriptionFromTags`` (image-prompt-template.ts:60-89);
* the per-image failure placeholder
  ``"[Image description unavailable: {msg}]"``
  (``base-image-service.ts:183-186``);
* a deterministic describe substitute: a stable pure function of
  (image id, context) standing in for provider calls
  (``base-image-service.ts:107-229``), so the processImages=true branch is
  reproducible by construction (FIXTURES.md §2).
"""

from __future__ import annotations

import hashlib

from .jsstr import js_trim

IMAGE_PROMPT_TEMPLATE = """# Task

Please describe the visual content of this image in detail, focusing on all visible elements, text, and relevant information.

- Focus primarily on visual elements directly observable in the image: shapes, colors, objects, arrangements, and any visible text. When appropriate, include reasonable interpretation of what these elements represent based on their visual context.
- For academic or technical visuals: Identify the specific type (bar chart, line graph, flow diagram, etc.). Describe axes, labels, data points, and visual patterns exactly as they appear in the image.
- For any text visible in the image: Provide an accurate transcription, maintaining the original layout where meaningful.
- For images with multiple panels: Describe each panel separately based on its visual appearance. Note any panel labels if present. If the composition is unusual or the panels interact in a non-standard way, explain their relationship.
{contextText}

# Format

- Begin with a concise overview sentence identifying the type of image (e.g., "A line graph showing...", "A diagram illustrating...", "A photograph of...").
- Then provide specific details in a well-structured format. Use multiple paragraphs if necessary to organize different aspects of complex images.
- For complex visuals, you may use bullet points or numbered lists to clearly separate distinct elements.
- Adjust the length of your description based on the complexity of the image - simple images may need only a paragraph, while complex diagrams might require more detailed explanations.

IMPORTANT: You must wrap your entire description inside <img_desc> and </img_desc> XML tags like this:

<img_desc>Your detailed description goes here.</img_desc>

Do not include anything else outside these tags."""


def format_image_prompt(context_text: str | None = None) -> str:
    """``formatImagePrompt`` (image-prompt-template.ts:41-53)."""
    if not context_text:
        return IMAGE_PROMPT_TEMPLATE.replace("{contextText}", "", 1)
    formatted_context = (
        "# Context\n\nContext for reference:\n\n<context>\n"
        f"{context_text}\n</context>\n\n"
        "Use this to correctly identify technical terms and provide "
        "reasonable interpretations of what you can see in the image.\n"
        "Your image description should still focus primarily on the visual "
        "aspects of the figure and not be a mere repetition of the image "
        "caption or provided context.\n"
    )
    return IMAGE_PROMPT_TEMPLATE.replace("{contextText}", formatted_context, 1)


def extract_description_from_tags(response: str | None) -> str | None:
    """``extractDescriptionFromTags`` (image-prompt-template.ts:60-89)."""
    if not response or not isinstance(response, str):
        return None
    trimmed = js_trim(response)
    opening = trimmed.find("<img_desc>")
    if opening == -1:
        return None
    content_start = opening + len("<img_desc>")
    closing = trimmed.find("</img_desc>", content_start)
    content = trimmed[content_start:closing] if closing != -1 else trimmed[content_start:]
    return js_trim(content)


def unavailable_placeholder(msg: str) -> str:
    """Per-image failure placeholder (base-image-service.ts:183-186)."""
    return f"[Image description unavailable: {msg}]"


def deterministic_describe(image_id: str, context: str) -> str:
    """Deterministic stand-in for the provider ``describeImage`` call.

    Pure function of (image id, context): emulates a provider response
    wrapped in ``<img_desc>`` tags, then extracts it through the same tag
    gate the reference uses (V2+V6), so the whole describe path is
    exercised without a network.
    """
    digest = hashlib.sha1(
        (image_id + "\x00" + context).encode("utf-8", errors="surrogatepass")
    ).hexdigest()[:12]
    body = (
        f"A figure identified as {image_id}.\n"
        f"Deterministic content fingerprint {digest}."
    )
    simulated_response = f"<img_desc>{body}</img_desc>"
    extracted = extract_description_from_tags(simulated_response)
    if extracted is None:
        return unavailable_placeholder("response_format_missing_tags")
    return extracted


def describe_images(
    image_ids: list[str], context_map: dict[str, str]
) -> dict[str, str]:
    """Deterministic batch describe (base-image-service.ts:107-229 without
    the sequential 500 ms network loop): Map insertion order preserved."""
    out: dict[str, str] = {}
    for image_id in image_ids:
        context = context_map.get(image_id, "")
        out[image_id] = deterministic_describe(image_id, context)
    return out
