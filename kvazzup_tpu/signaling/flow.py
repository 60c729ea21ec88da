"""SIP message-processing flow: an ordered middleware chain.

Parity: /root/reference/src/initiation/sipmessageprocessor.h (one
processor with incoming/outgoing hooks that pass messages along) and
sipmessageflow.h (the ordered pipe the SIPManager assembles per
transport: sanity -> routing -> authentication -> dialogs).  Round 1
folded these steps into hardcoded calls inside the endpoint; this
restores the extension seam — a processor can rewrite a message, absorb
it, or short-circuit a response — and SipEndpoint now runs its sanity +
routing steps through a flow you can extend (e.g. drop-in authentication
or logging processors).
"""

from __future__ import annotations

from .sip import SipMessage


class SipProcessor:
    """One middleware stage.  Override any hook; the defaults pass the
    message through unchanged.

    Hook contract (mirrors the reference's slots):
    - return the (possibly modified) message to continue the chain;
    - return None to absorb the message (processing stops);
    - incoming hooks may instead return a SipMessage RESPONSE with
      `.status` set and `generated=True` semantics: the flow sends it
      back and stops (sipmessageprocessor.h generatedResponse).
    """

    def outgoing_request(self, msg: SipMessage, ctx: dict):
        return msg

    def outgoing_response(self, msg: SipMessage, ctx: dict):
        return msg

    def incoming_request(self, msg: SipMessage, ctx: dict):
        return msg

    def incoming_response(self, msg: SipMessage, ctx: dict):
        return msg

    def uninit(self) -> None:
        pass


class SipFlow:
    """Ordered processor pipe (sipmessageflow.h).

    Outgoing messages traverse the chain in order; incoming messages in
    REVERSE order (the transport end is the last processor), matching the
    reference's signal wiring.  `ctx` is the per-message side-channel
    (the QVariant& content analogue): processors share derived state
    (source address, auth credentials, generated responses) through it.
    """

    def __init__(self, processors=()):
        self.processors = list(processors)

    def add(self, processor: SipProcessor) -> "SipFlow":
        self.processors.append(processor)
        return self

    def uninit(self) -> None:
        for p in self.processors:
            p.uninit()

    # -- traversal ----------------------------------------------------------
    def _run(self, chain, hook_name, msg, ctx):
        for p in chain:
            hook = getattr(p, hook_name)
            out = hook(msg, ctx)
            if out is None:
                return None
            if isinstance(out, SipMessage) and out is not msg \
                    and out.status is not None and msg.method is not None:
                # a processor generated a response to this request:
                # short-circuit (the flow owner sends it back)
                ctx["generated_response"] = out
                return None
            msg = out
        return msg

    def outgoing_request(self, msg, ctx=None):
        return self._run(self.processors, "outgoing_request", msg, ctx or {})

    def outgoing_response(self, msg, ctx=None):
        return self._run(self.processors, "outgoing_response", msg, ctx or {})

    def incoming_request(self, msg, ctx=None):
        return self._run(list(reversed(self.processors)), "incoming_request",
                         msg, ctx if ctx is not None else {})

    def incoming_response(self, msg, ctx=None):
        return self._run(list(reversed(self.processors)), "incoming_response",
                         msg, ctx if ctx is not None else {})


class SanityProcessor(SipProcessor):
    """Reject malformed incoming messages (sipmessagesanity.cpp stage):
    bad requests generate a 400, bad responses are absorbed."""

    def incoming_request(self, msg, ctx):
        from .transport import SanityError, sanity_check

        try:
            sanity_check(msg)
        except SanityError as e:
            ctx["sanity_error"] = str(e)
            if msg.method != "ACK":
                resp = SipMessage(status=400, reason="Bad Request")
                for h in ("Via", "From", "To", "Call-ID", "CSeq"):
                    v = msg.get(h)
                    if v:
                        resp.add(h, v)
                return resp
            return None
        return msg

    def incoming_response(self, msg, ctx):
        from .transport import SanityError, sanity_check

        try:
            sanity_check(msg)
        except SanityError as e:
            ctx["sanity_error"] = str(e)
            return None
        return msg


class RoutingProcessor(SipProcessor):
    """Via/rport/Contact handling (siprouting.{h,cpp} stage)."""

    def __init__(self, routing) -> None:
        self.routing = routing

    def outgoing_request(self, msg, ctx):
        self.routing.prepare_request(msg)
        if msg.get("Max-Forwards") is None:
            msg.add("Max-Forwards", "70")
        return msg

    def outgoing_response(self, msg, ctx):
        self.routing.prepare_response(msg)
        return msg

    def incoming_request(self, msg, ctx):
        source = ctx.get("source")
        if source is not None:
            self.routing.stamp_received(msg, source)
        return msg

    def incoming_response(self, msg, ctx):
        if not self.routing.learn_from_response(msg):
            ctx["not_for_us"] = True
            return None
        return msg
