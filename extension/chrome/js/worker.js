// Service worker: fetch the original image bytes and POST them to the
// upscale cache frontend; reply with the upscaled file URL.
// Parity with reference src/extension/chrome/js/ss4_worker.js:10-73.

const DEFAULT_ENDPOINT = "http://127.0.0.1:8086";
const inflight = new Map();

async function endpoint() {
  const stored = await chrome.storage.sync.get({ endpoint: DEFAULT_ENDPOINT });
  return stored.endpoint;
}

async function upscale(url) {
  if (inflight.has(url)) return inflight.get(url);
  const work = (async () => {
    const base = await endpoint();
    const imageResp = await fetch(url);
    if (!imageResp.ok) return null;
    const blob = await imageResp.blob();
    if (blob.size > 8 * 1024 * 1024) return null;
    const form = new FormData();
    form.append("file", blob, "image");
    const resp = await fetch(`${base}/upscale/image`, {
      method: "POST",
      body: form,
    });
    if (!resp.ok) return null;
    const body = await resp.json();
    if (body.result !== "ok") return null;
    return `${base}${body.url}`;
  })().catch(() => null);
  inflight.set(url, work);
  const result = await work;
  inflight.delete(url);
  return result;
}

chrome.runtime.onMessage.addListener((msg, _sender, sendResponse) => {
  if (msg.type === "upscale") {
    upscale(msg.url).then((url) => sendResponse({ url }));
    return true; // async response
  }
});
